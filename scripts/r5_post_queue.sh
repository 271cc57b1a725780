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

note "V=3 + V=1 surgery points (latency + quality: the full V curve)"
timeout 3600 $PY scripts/probe_codesign.py latency --variants 8x3,8x1 \
    || note "v3/v1 latency rc=$?"
timeout 7200 $PY scripts/probe_v2_surgery.py \
    --src results/soak/s2 --views 3 --steps 15000 \
    || note "v3 surgery rc=$?"
timeout 7200 $PY scripts/probe_v2_surgery.py \
    --src results/soak/s2 --views 1 --steps 15000 \
    || note "v1 surgery rc=$?"

note "post-queue complete"
