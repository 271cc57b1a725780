#!/bin/bash
# Round-5 TPU work queue: runs the remaining single-chip probes
# SEQUENTIALLY (never two TPU processes at once) after the in-flight
# codesign candidate arm finishes. Every probe is idempotent (.ok
# sidecars), so re-running this script after a VM recycle resumes where
# it left off. Detach with setsid; PID lands in /tmp/r5_queue.pid.
set -u
cd /root/repo
PY=/opt/venv/bin/python
LOG=/tmp/r5_queue.log

note() { echo "[QUEUE $(date +%H:%M:%S)] $*"; }

# 0. Wait for the codesign driver (extended A/B candidate arm) to exit.
if [ -f /tmp/codesign_ext.pid ]; then
    CPID=$(cat /tmp/codesign_ext.pid)
    while kill -0 "$CPID" 2>/dev/null; do sleep 60; done
    note "codesign driver ($CPID) done"
fi

# Cheap probes first so a VM recycle mid-soak can't orphan them.

# 1. HBM bandwidth measurement backing DESIGN.md's byte-floor table
#    (the script appends results/probes_r5_hbm.txt itself).
note "bench_hbm"
timeout 3600 $PY scripts/bench_hbm.py || note "bench_hbm rc=$?"

# 2. rgb0 drift demonstration (three short stage-2 arms; minutes on TPU).
note "rgb0 drift probe"
timeout 5400 $PY scripts/probe_rgb0_drift.py || note "rgb0 probe rc=$?"

# 3. V=2 surgery: derive the fast point from the trained 210k V=4 control
#    + short stage-2 fine-tune, eval with the serving graph.
note "v2 surgery probe"
timeout 14400 $PY scripts/probe_v2_surgery.py \
    --src logs_codesign/s8v4_s2_120000p60000 --steps 15000 \
    || note "surgery probe rc=$?"

# 4. Fern-scale multi-scene soak (VERDICT next-5): 8 scenes at
#    504x378x17 through train-multi, per-scene held-out PSNR curves.
note "multi-scene soak"
timeout 21600 $PY scripts/probe_multi_soak.py || note "multi soak rc=$?"

note "queue complete"
