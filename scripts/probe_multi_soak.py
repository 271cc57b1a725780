"""Fern-scale multi-scene soak (BASELINE.md stretch goal made real):
train 8 distinct synthetic scenes at the fern operating point
(504x378, 17 views, 4096-ray batches) in ONE SPMD program through the
released `train-multi` CLI, then distill the per-scene held-out PSNR
curves + throughput into committed evidence.

On the single attached chip the (scene, rays) mesh degrades to (1, 1)
and scenes time-multiplex inside each dispatch — the same program lays
out one-scene-per-mesh-row on real multi-chip slices
(parallel/multi_scene.py; equality vs the single-scene step is tested in
tests/test_parallel.py).

Phases (idempotent, .ok sidecars):
  stage1   train-multi --stage 1 for --s1 steps, held-out eval every
           --i-testset
  stage2   train-multi --stage 2 bootstrapping from the stage-1 expdir
  summary  parse the train logs -> results/soak/multi/{curves.jsonl,
           summary.json}

Usage: python scripts/probe_multi_soak.py [--s1 15000] [--s2 4000]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT_DIR = REPO / "results/soak/multi"
N_SCENES = 8
SPEC = "synthetic:504x378x17"


def _run_cli(cmd, log_path):
    log_path = pathlib.Path(log_path)
    ok = log_path.with_suffix(log_path.suffix + ".ok")
    if ok.exists() and log_path.exists():
        print(f"[MULTISOAK] skip (done): {' '.join(cmd[:6])} ...", flush=True)
        return log_path.read_text(), float(ok.read_text() or 0)
    print(f"[MULTISOAK] $ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    # Stream to the log file as the stage runs so the evidence snapshotter
    # can commit in-flight curves (a VM recycle mid-stage keeps progress).
    with log_path.open("w") as fh:
        proc = subprocess.run(
            cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT, text=True
        )
    text = log_path.read_text()
    dt = time.time() - t0
    if proc.returncode != 0:
        print(text[-3000:])
        raise SystemExit(f"stage failed rc={proc.returncode} ({dt:.0f}s)")
    ok.write_text(f"{dt:.1f}")
    return text, dt


def _parse_log(text, stage):
    """Pull per-scene eval PSNR curves + throughput from the train log.

    multi_loop prints:
      [TRAIN-MULTI] Iter: 5000 it/s: 3.12 loss synthetic0:0.0021 ...
      [TRAIN-MULTI] Iter 5000 per-scene test PSNR: synthetic0:28.41 ...
    """
    rows = []
    for m in re.finditer(r"Iter (\d+) per-scene test PSNR: (.*)", text):
        step = int(m.group(1))
        psnrs = {
            k: float(v)
            for k, v in re.findall(r"(\S+):([0-9.]+)", m.group(2))
        }
        rows.append({"stage": stage, "step": step, "psnr": psnrs})
    rates = [float(r) for r in re.findall(r"it/s: ([0-9.]+)", text)]
    rate = sorted(rates)[len(rates) // 2] if rates else None
    return rows, rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s1", type=int, default=15000)
    ap.add_argument("--s2", type=int, default=4000)
    ap.add_argument("--i-testset", type=int, default=5000, dest="i_testset")
    ap.add_argument("--spec", default=SPEC)
    ap.add_argument("--n-scenes", type=int, default=N_SCENES,
                    dest="n_scenes")
    ap.add_argument("--base", default="logs_multisoak")
    ap.add_argument("--extra", default="",
                    help="extra passthrough flags, space-separated")
    args = ap.parse_args()

    base = REPO / args.base
    base.mkdir(exist_ok=True)
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    py = [sys.executable, "-m", "pronerf_tpu.cli"]
    scenes = ",".join([args.spec] * args.n_scenes)
    common = ["--basedir", str(base), "--i_print", "500",
              "--i_video", "0", "--i_img", "0"]
    if args.extra:
        common += args.extra.split()

    t1_text, t1 = _run_cli(
        py + ["train-multi", "--stage", "1", "--max-steps", str(args.s1),
              "--scenes", scenes,
              "--config", "configs/llff/fern/fern_epi.txt", "--",
              "--expname", "multi8_s1",
              "--i_weights", str(args.s1),
              "--i_testset", str(args.i_testset)] + common,
        base / "s1.log",
    )
    t2_text, t2 = _run_cli(
        py + ["train-multi", "--stage", "2", "--max-steps", str(args.s2),
              "--scenes", scenes,
              "--pretrain-path", str(base / "multi8_s1"),
              "--config", "configs/llff/fern/fern_refine.txt", "--",
              "--expname", "multi8_s2",
              "--i_weights", str(args.s2),
              "--i_testset", str(args.s2 // 2)] + common,
        base / "s2.log",
    )

    curves, summary = [], {"n_scenes": args.n_scenes, "spec": args.spec}
    for text, stage, wall in ((t1_text, 1, t1), (t2_text, 2, t2)):
        rows, rate = _parse_log(text, stage)
        curves.extend(rows)
        summary[f"s{stage}_it_per_s_median"] = rate
        summary[f"s{stage}_wall_s"] = round(wall, 1)
        if rows:
            summary[f"s{stage}_final_psnr"] = rows[-1]["psnr"]
    (OUT_DIR / "curves.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in curves)
    )
    (OUT_DIR / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
