"""Summarize a soak run's metrics.jsonl into the compact table STATUS.md
cites: training-PSNR curve samples + wall-rate, one JSON line per stage.

Usage: python scripts/summarize_soak.py [basedir]   (default logs_soak)
"""

from __future__ import annotations

import json
import pathlib
import sys

BASE = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "logs_soak")


def summarize(stage_dir: pathlib.Path):
    mf = stage_dir / "metrics.jsonl"
    if not mf.exists():
        return None
    recs = [json.loads(l) for l in mf.read_text().splitlines() if l.strip()]
    recs = [r for r in recs if "psnr" in r]
    if not recs:
        return None
    # thin the curve to <= 12 points, always keeping first and last
    n = len(recs)
    idx = sorted({0, n - 1, *range(0, n, max(1, n // 10))})
    curve = [
        {"step": recs[i]["step"], "psnr": round(recs[i]["psnr"], 2)}
        for i in idx
    ]
    rates = [r["it_per_s"] for r in recs if r.get("it_per_s")]
    return {
        "stage": stage_dir.name,
        "last_step": recs[-1]["step"],
        "last_chunk_psnr_db": round(recs[-1]["psnr"], 2),
        "it_per_s_median": round(sorted(rates)[len(rates) // 2], 1)
        if rates else None,
        "curve": curve,
    }


def main():
    found = False
    for name in ("s1", "s2"):
        s = summarize(BASE / name)
        if s:
            print(json.dumps(s))
            found = True
    ev = BASE.parent / "results" / "soak" / "final_eval.txt"
    if ev.exists():
        for line in ev.read_text().splitlines():
            if "Mean Test PSNR" in line or "ms/frame" in line:
                print(json.dumps({"final_eval": line.strip()}))
    if not found:
        print(json.dumps({"error": f"no metrics under {BASE}"}))


if __name__ == "__main__":
    main()
