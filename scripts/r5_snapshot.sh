#!/bin/bash
# Round-5 evidence snapshotter: a VM recycle wipes everything untracked
# (it already cost us the 210k codesign checkpoints once this round), so
# every 15 minutes commit the probe result files the TPU queue appends
# to, and hourly copy the newest in-flight codesign stage-1 checkpoint
# into the committed tree. Only adds SPECIFIC paths — never sweeps up
# unrelated working-tree edits.
set -u
cd /root/repo
mkdir -p results/codesign
i=0
while true; do
    # Newest V=2 stage-1 ckpt, hourly (4 x 15 min), overwrite-in-place.
    if [ $((i % 4)) -eq 0 ] && [ -d logs_codesign/s8v2_s1 ]; then
        new=$(ls logs_codesign/s8v2_s1/*.ckpt 2>/dev/null | sort | tail -1)
        if [ -n "${new:-}" ] && ! cmp -s "$new" results/codesign/s8v2_s1_latest.ckpt 2>/dev/null; then
            cp "$new" results/codesign/s8v2_s1_latest.ckpt
            echo "${new##*/}" > results/codesign/s8v2_s1_latest.step
        fi
    fi
    # In-flight multi-soak stage logs (streamed by probe_multi_soak).
    if [ -d logs_multisoak ]; then
        mkdir -p results/soak/multi/inflight
        for f in logs_multisoak/s1.log logs_multisoak/s2.log; do
            [ -f "$f" ] && cp "$f" results/soak/multi/inflight/
        done
    fi
    git add results/probes_r5_rgb0.txt results/probes_r5_surgery.txt \
        results/probes_r5_hbm.txt results/probes_r4_codesign.txt \
        results/probes_r5_bf16_train.txt \
        results/codesign results/soak/multi 2>/dev/null
    if ! git diff --cached --quiet 2>/dev/null; then
        git commit -q -m "Round-5 probe evidence snapshot" || true
    fi
    i=$((i + 1))
    sleep 900
done
