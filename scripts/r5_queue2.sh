#!/bin/bash
# Round-5 TPU work queue, take 2: the first queue (r5_queue.sh) died with
# a VM recycle that also wiped the UNCOMMITTED logs_codesign/ checkpoints
# (the 90k/210k stage-1 states the extended codesign A/B was resuming).
# What survives is committed: the control arm's 210k-absolute quality row
# (results/probes_r4_codesign.txt, schedule label "120000+60000") and the
# full-schedule soak checkpoints (results/soak/{s1,s2}/*.ckpt).
#
# Recovery plan (sequential — never two TPU processes at once; every leg
# idempotent via .ok sidecars so this script is safe to re-run):
#   1. bench_hbm          cheap; backs DESIGN.md's byte-floor table
#   2. rgb0 drift probe   cheap; corroborates the oracle-test attribution
#   3. V=2 surgery        NOW SOURCED FROM THE COMMITTED SOAK CHECKPOINT
#                         (full 500k+370k schedule) instead of the lost
#                         codesign control — a strictly better teacher
#   4. codesign V=2 arm   the missing third trend point: stage-1 from
#                         scratch to ABSOLUTE 210k (matching the control
#                         row's absolute steps; label stays 120000+60000),
#                         periodic ckpts so a recycle resumes marginally
#   5. multi-scene soak   fern-scale train-multi (VERDICT next-5),
#                         reduced schedule to fit the round
set -u
cd /root/repo
PY=/opt/venv/bin/python

note() { echo "[QUEUE2 $(date +%H:%M:%S)] $*"; }

note "1. bench_hbm"
timeout 3600 $PY scripts/bench_hbm.py || note "bench_hbm rc=$?"

note "2. rgb0 drift probe"
timeout 5400 $PY scripts/probe_rgb0_drift.py || note "rgb0 probe rc=$?"

note "3. v2 surgery (src = committed full-schedule soak ckpt)"
timeout 10800 $PY scripts/probe_v2_surgery.py \
    --src results/soak/s2 --steps 15000 \
    || note "surgery probe rc=$?"

note "4. codesign V=2 arm at absolute 210k+60k (label 120000+60000)"
# --max-steps is MARGINAL on resume: compute the remainder so a rerun
# after a mid-leg crash continues to the same absolute endpoint.
REM=$($PY - <<'EOF'
import pathlib, re
d = pathlib.Path("logs_codesign/s8v2_s1")
steps = [int(re.match(r"(\d+)\.ckpt$", p.name).group(1))
         for p in d.glob("*.ckpt")] if d.is_dir() else []
print(max(1, 210000 - (max(steps) if steps else 0)))
EOF
)
note "   stage-1 marginal steps: $REM"
timeout 18000 $PY scripts/probe_codesign.py quality --variants 8x2 \
    --s1 120000 --s2 60000 --s1-cmd-steps "$REM" --i-weights 30000 \
    || note "codesign rc=$?"

note "5. multi-scene soak (reduced schedule)"
timeout 14400 $PY scripts/probe_multi_soak.py \
    --s1 10000 --s2 3000 --i-testset 2500 \
    || note "multi soak rc=$?"

note "queue complete"
