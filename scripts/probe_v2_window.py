"""Whole-frame (gather_tiles, gather_window_rows) mini-sweep at the
co-designed fast operating point (num_neighbor=2, 1008x756).

Why: the windowed-gather statics were tuned at the parity point V=4
(isolated sweep `results/probes_r4_window_sweep.txt`; whole-frame default
validated render-exact in `probes_r4_windowed_psnr.txt`). At V=2 the
per-view gather count and its relayout copies halve while the band-size
gather-rate cliff is unchanged, so the in-frame optimum may sit at a
different (tiles, rows) point. This probe measures WHOLE FRAMES through
bench.py's exact amortized protocol (the only measurement that prices the
gather/copy/kernel interactions correctly — isolated gather wins have
repeatedly failed to transfer, DESIGN.md "Measurement discipline").

Usage: python scripts/probe_v2_window.py   (TPU, ~20-30 min: one compile
per grid point; results append to results/probes_r4_v2_window.txt)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / "results/probes_r4_v2_window.txt"

# (tiles, window_rows); None = the auto-resolved default (re-anchor);
# a dict = raw statics overrides (e.g. the kernel ray-block size, whose
# V=4 full-res answer — 8192 measured worse — may not transfer to V=2).
GRID = [None, (6, 220), (12, 160), (16, 198),
        {"pallas_block_rays": 8192}]


def main():
    from bench import run_bench

    for point in GRID:
        overrides = None
        name = "auto"
        if isinstance(point, dict):
            overrides = point
            name = "_".join(f"{k}{v}" for k, v in point.items())
        elif point is not None:
            overrides = {"gather_tiles": point[0],
                         "gather_window_rows": point[1]}
            name = f"tiles{point[0]}_wr{point[1]}"
        t0 = time.time()
        try:
            ms, rps, null, _single = run_bench(
                756, 1008, frames_per_loop=4, reps=3,
                num_neighbor=2, statics_overrides=overrides,
            )
            rec = {"variant": name, "V": 2, "res": "1008x756",
                   "ms": round(ms, 2),
                   "mrays_per_sec": round(rps / 1e6, 2),
                   "null_ms": round(null, 2),
                   "wall_s": round(time.time() - t0, 1)}
        except Exception as exc:  # keep sweeping past one bad point
            rec = {"variant": name, "V": 2, "error": str(exc)[:200]}
        line = json.dumps(rec)
        print(line, flush=True)
        with open(OUT, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
