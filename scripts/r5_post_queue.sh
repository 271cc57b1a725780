#!/bin/bash
# Runs after r5_queue2.sh finishes (chained by a waiter on its PID):
# the probes added mid-round that still need the chip, cheapest first.
set -u
cd /root/repo
PY=/opt/venv/bin/python
note() { echo "[POSTQ $(date +%H:%M:%S)] $*"; }

note "bench_hbm"
timeout 3600 $PY scripts/bench_hbm.py || note "bench_hbm rc=$?"

note "bf16 train A/B"
timeout 7200 $PY scripts/probe_bf16_train.py || note "bf16 probe rc=$?"

note "post-queue complete"
