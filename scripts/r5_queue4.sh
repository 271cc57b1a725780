#!/bin/bash
# Round-5 queue, leg 4: chained TPU work after the fern-scale multi-scene
# soak (PID in /tmp/multisoak.pid) releases the chip. One TPU process at
# a time (CLAUDE.md: concurrent host work degrades tunnel dispatch).
#
#   1. the last missing scratch V-curve quality point (8,1) at 30k+15k
#      (completes the codesign quality table's V axis)
#   2. bench.py verification pass (the driver re-runs it at round end)
set -u
cd /root/repo
PY=/opt/venv/bin/python
note() { echo "[QUEUE4 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    note "waiting for PID $WAIT_PID (multi-scene soak)"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    note "chip free"
fi

note "scratch V-curve quality point (8,1) at 30k+15k"
timeout 10800 $PY scripts/probe_codesign.py quality --variants 8x1 \
    || note "v-curve quality rc=$?"

note "bench.py verification pass"
timeout 3600 $PY bench.py > /tmp/r5_bench_check.log 2>&1 \
    || note "bench rc=$?"
tail -1 /tmp/r5_bench_check.log

note "queue4 complete"
