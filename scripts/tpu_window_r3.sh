#!/bin/bash
# One-stop TPU measurement window for the round-3 full-res perf push.
# Run while the soak is PAUSED (never two TPU processes at once — the
# interleaved dispatches corrupt measurements; DESIGN.md "Measurement
# discipline"). Everything lands under results/probes_r3/.
#
# Usage: bash scripts/tpu_window_r3.sh [quick|full]
#   quick: profile only (~15 min incl. cold full-res compile)
#   full:  profile + block sweep + window sweep (~45-75 min)
set -u
cd "$(dirname "$0")/.."
MODE="${1:-quick}"
OUT=results/probes_r3
mkdir -p "$OUT"

echo "=== profile_ops pallas 1008x756 ($(date -u +%T)) ==="
timeout 1800 python scripts/profile_ops.py pallas 40 1008x756 \
  2>&1 | tee "$OUT/profile_fullres_pallas.txt"

echo "=== profile_ops pallas 504x378 ($(date -u +%T)) ==="
timeout 1200 python scripts/profile_ops.py pallas 40 504x378 \
  2>&1 | tee "$OUT/profile_504_pallas.txt"

if [ "$MODE" = "full" ]; then
  echo "=== bench_fullres_block 4096 8192 ($(date -u +%T)) ==="
  timeout 2400 python scripts/bench_fullres_block.py 4096 8192 \
    2>&1 | tee "$OUT/fullres_block_sweep.txt"

  echo "=== gather window sweep ($(date -u +%T)) ==="
  timeout 2400 python scripts/bench_gather_window_sweep.py \
    2>&1 | tee "$OUT/window_sweep.txt"
fi

git add -A "$OUT" && git commit -q -m "TPU probe window results (round 3 full-res push)" -- "$OUT" || true
echo "=== window done ($(date -u +%T)) ==="
