#!/bin/bash
# Round-5 queue, leg 3: chained TPU work after the in-flight bf16
# quality A/B (PID passed as $1) releases the chip. One TPU process at a
# time (CLAUDE.md: concurrent host work degrades tunnel dispatch).
#
#   1. fern-scale multi-scene soak retry (VERDICT next-5; the previous
#      attempt OOM'd before the lax.map time-multiplex fix, 8cc1c1d)
#   2. scratch V-curve screening points (8,3)/(8,1) at 30k+15k to
#      complete the codesign quality table next to the surgery points
#   3. bench.py verification pass (the driver re-runs it at round end)
set -u
cd /root/repo
PY=/opt/venv/bin/python
note() { echo "[QUEUE3 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    note "waiting for PID $WAIT_PID (bf16 quality A/B)"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    note "chip free"
fi

note "multi-scene fern-scale soak (8 scenes, 15k+4k)"
timeout 14400 $PY scripts/probe_multi_soak.py || note "multi soak rc=$?"

note "scratch V-curve screening points (8,3)+(8,1) at 30k+15k"
timeout 10800 $PY scripts/probe_codesign.py quality --variants 8x3,8x1 \
    || note "v-curve quality rc=$?"

note "bench.py verification pass"
timeout 3600 $PY bench.py > /tmp/r5_bench_check.log 2>&1 \
    || note "bench rc=$?"
tail -1 /tmp/r5_bench_check.log

note "queue3 complete"
