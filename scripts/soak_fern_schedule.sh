#!/bin/bash
# Full-reference-schedule soak on the consistent synthetic scene:
#   stage 1: 500k steps, fern_epi verbatim   (ref: run_S_eS_eN_alter_base.py:887)
#   stage 2: 370k steps, fern_refine verbatim (ref run_S_eS_eN_alter_base_refine2.py
#            schedule, bootstrapped from the stage-1 checkpoint)
#   eval:    bf16 serving eval of the stage-2 result
#
# IDEMPOTENT / RESUMABLE: run it again after any interruption and each stage
# auto-resumes from its newest logs_soak/{s1,s2}/*.ckpt (the trainers reload
# unless --no-reload is passed; `--max-steps` is start-relative — the
# reference's `N_iters = start + max_steps + 1` quirk — so the stage-2
# remaining-step count is computed from the newest checkpoint name).
#
# Wall cost at measured rates (~40 it/s stage 1 on the 80x60 scene):
# stage 1 ~3.5 h, stage 2 ~2.6 h. Bound each invocation with `timeout` when
# sharing the TPU with other work; progress lands in logs_soak/*/metrics.jsonl.
set -u
cd "$(dirname "$0")/.."

S2_TARGET=370000
# Scene spec: default the tiny consistent scene; set SOAK_SPEC to e.g.
# synthetic:504x378x17 to run the schedule at the fern operating point
# (practical once the pool reshuffle stopped re-uploading ~129 MB per
# epoch — see train/fast_loop.py:device_reshuffle).
SPEC="${SOAK_SPEC:-synthetic}"

# logs*/ is gitignored and scratch VMs get recycled — mirror the curve
# evidence into the committed results/ tree AND commit it (a plain copy died
# with the VM once already; only git survives resets). Metrics snapshot every
# 15 min; the newest checkpoint is mirrored hourly + at stage boundaries so a
# reset mid-stage loses at most ~1 h of training.
snapshot() {
  mkdir -p results/soak
  for s in s1 s2; do
    [ -f "logs_soak/$s/metrics.jsonl" ] && \
      cp "logs_soak/$s/metrics.jsonl" "results/soak/${s}_metrics.jsonl"
  done
  git add -A results/soak 2>/dev/null
  git diff --cached --quiet -- results/soak || \
    git commit -q -m "Soak evidence snapshot ($(date -u +%FT%TZ))" \
      -- results/soak >/dev/null 2>&1 || true
}

snapshot_ckpt() {  # mirror newest ckpt per stage (keep only one in results/)
  mkdir -p results/soak
  for s in s1 s2; do
    local f
    f=$(ls "logs_soak/$s"/*.ckpt 2>/dev/null | sort | tail -1)
    if [ -n "$f" ]; then
      mkdir -p "results/soak/$s"
      rm -f "results/soak/$s"/*.ckpt
      cp "$f" "results/soak/$s/$(basename "$f")"
    fi
  done
  snapshot
}

restore() {  # after a VM reset: repopulate logs_soak from committed evidence
  for s in s1 s2; do
    if [ ! -d "logs_soak/$s" ] && ls "results/soak/$s"/*.ckpt >/dev/null 2>&1
    then
      mkdir -p "logs_soak/$s"
      cp "results/soak/$s"/*.ckpt "logs_soak/$s/"
      [ -f "results/soak/${s}_metrics.jsonl" ] && \
        cp "results/soak/${s}_metrics.jsonl" "logs_soak/$s/metrics.jsonl"
      echo "=== SOAK restore: $s resumed from committed snapshot ==="
    fi
  done
}

snapshot_loop() {
  local n=0
  while true; do
    sleep 900
    n=$((n + 1))
    if [ $((n % 4)) -eq 0 ]; then snapshot_ckpt; else snapshot; fi
  done
}

restore
snapshot_loop & SNAP_PID=$!
trap 'kill "$SNAP_PID" 2>/dev/null; snapshot_ckpt' EXIT

latest_step() {  # latest_step <expdir> -> newest ckpt step number (or -1)
  local f
  f=$(ls "$1"/*.ckpt 2>/dev/null | sort | tail -1)
  if [ -z "$f" ]; then echo -1; else basename "$f" .ckpt | sed 's/^0*//;s/^$/0/'; fi
}

s1_step=$(latest_step logs_soak/s1)
if [ "$s1_step" -lt 500000 ]; then
  echo "=== SOAK stage 1 ($(date -u +%FT%TZ)): resume from step $s1_step to 500k ==="
  python -m pronerf_tpu.cli train-stage1 \
    --config configs/llff/fern/fern_epi.txt -- \
    --datadir "$SPEC" --basedir logs_soak --expname s1 \
    --scan_steps 50 --i_print 20000 --i_weights 50000 --i_testset 250000 \
    --i_video 0 --i_img 0 || exit 1
fi
snapshot_ckpt

s2_step=$(latest_step logs_soak/s2)
if [ "$s2_step" -lt "$S2_TARGET" ]; then
  [ "$s2_step" -lt 0 ] && s2_step=0
  remaining=$((S2_TARGET - s2_step))
  CKPT=$(ls logs_soak/s1/*.ckpt | sort | tail -1)
  echo "=== SOAK stage 2 ($(date -u +%FT%TZ)): from step $s2_step, $remaining to go, pretrain $CKPT ==="
  python -m pronerf_tpu.cli train-stage2 --max-steps "$remaining" \
    --config configs/llff/fern/fern_refine.txt --pretrain-path "$CKPT" -- \
    --datadir "$SPEC" --basedir logs_soak --expname s2 \
    --scan_steps 50 --i_print 20000 --i_weights 50000 --i_testset 200000 \
    --i_video 0 --i_img 0 || exit 1
fi
snapshot_ckpt

echo "=== SOAK eval ($(date -u +%FT%TZ)): bf16 serving eval of the stage-2 result ==="
CKPT2=$(ls logs_soak/s2/*.ckpt | sort | tail -1)
mkdir -p results/soak
python -m pronerf_tpu.cli eval --use-trt \
  --checkpoint "$CKPT2" -- \
  --datadir "$SPEC" --basedir logs_soak --expname eval \
  --tile_rays 2048 --use_pallas False 2>&1 | tee results/soak/final_eval.txt
echo "=== SOAK done ($(date -u +%FT%TZ)) ==="
