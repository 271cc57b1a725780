"""In-frame int8 A/B through bench.py's exact protocol (VERDICT next-1a:
the r3 standalone probe said int8 is slower; the whole-frame A/B never
completed). Runs `quant=int8` vs the bf16 default at both operating
points. Usage: python scripts/probe_int8_frame.py [full|fern|all]
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
    for label, ov in (("int8", {"quant": "int8"}), ("bf16", None)):
        try:
            ms, rps, null, _single = run_bench(
                H, W, frames_per_loop=fpl, reps=reps, statics_overrides=ov
            )
            print(json.dumps({"point": name, "variant": label,
                              "ms": round(ms, 2),
                              "mrays_per_s": round(rps / 1e6, 2),
                              "null_ms": round(null, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"point": name, "variant": label,
                              "error": str(e)[:300]}), flush=True)
print("EXIT:0", flush=True)
