"""A/B the transposed gather emit (RenderStatics.gather_transposed)
through bench.py's exact serving protocol, at both operating points.

Motivation (results/probes_r4_serving.txt): the standalone (tile, view)
gather ending IN the kernel-consumable transposed layout measures
0.89 ms — the row-major frame pays ~1.0 ms gather + ~0.8 ms relayout copy
per (tile, view) at 1008x756 (profile_fullres_rowmajor_categories). If the
probe transfers, full-res drops ~25-30 ms.

Usage: python scripts/probe_t_emit.py [full|fern|all]
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import run_bench  # noqa: E402

want = sys.argv[1] if len(sys.argv) > 1 else "all"
points = []
if want in ("full", "all"):
    points.append(("1008x756", 756, 1008, 4, 3))
if want in ("fern", "all"):
    points.append(("504x378", 378, 504, 6, 4))

for name, H, W, fpl, reps in points:
    for label, ov in (("t_emit", None), ("row_major", {"gather_transposed": 0})):
        try:
            ms, rps, null, _single = run_bench(
                H, W, frames_per_loop=fpl, reps=reps, statics_overrides=ov
            )
            print(json.dumps({
                "point": name, "variant": label, "ms": round(ms, 2),
                "mrays_per_s": round(rps / 1e6, 2),
                "null_ms": round(null, 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"point": name, "variant": label,
                              "error": str(e)[:300]}), flush=True)
print("EXIT:0", flush=True)
