"""Matched-schedule quality A/B for ``train_precision=bf16`` through the
released CLI (same protocol as the codesign quality A/Bs: identical
scene/seed/flags, held-out bf16-serving eval; codesign probe =
``scripts/probe_codesign.py``).

Why: the bf16 train compute measured 2.34x faster
(results/probes_r5_bf16_train.txt: alternating step 20.96 -> 8.95 ms),
and the 3k-step screen showed no quality penalty — this probe prices it
at the codesign screening scale (default 30k+15k). Default stays f32
(reference numeric parity); this measures what the throughput opt-in
costs.

Rows append to results/probes_r5_bf16_train.txt (phase "quality").
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
OUT_DEFAULT = REPO / "results/probes_r5_bf16_train.txt"


def emit(out_path, obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(out_path, "a") as f:
        f.write(line + "\n")


def _run_cli(cmd, log_path):
    log_path = pathlib.Path(log_path)
    ok = log_path.with_suffix(log_path.suffix + ".ok")
    if ok.exists() and log_path.exists():
        print(f"[BF16Q] skip (done): {' '.join(cmd[:6])} ...", flush=True)
        return log_path.read_text(), float(ok.read_text() or 0)
    print(f"[BF16Q] $ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    text = proc.stdout + proc.stderr
    log_path.write_text(text)
    dt = time.time() - t0
    if proc.returncode != 0:
        print(text[-3000:])
        raise SystemExit(f"stage failed rc={proc.returncode} ({dt:.0f}s)")
    ok.write_text(f"{dt:.1f}")
    return text, dt


def _grep(text, pat):
    m = re.search(pat, text)
    return float(m.group(1)) if m else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s1", type=int, default=30000)
    ap.add_argument("--s2", type=int, default=15000)
    ap.add_argument("--spec", default="synthetic:504x378x17")
    ap.add_argument("--out", default=str(OUT_DEFAULT))
    args = ap.parse_args()

    base = REPO / "logs_bf16q"
    base.mkdir(exist_ok=True)
    py = [sys.executable, "-m", "pronerf_tpu.cli"]
    for tp in ("f32", "bf16"):
        tag = f"tp_{tp}"
        flags = ["--train_precision", tp]
        _, t1 = _run_cli(
            py + ["train-stage1", "--max-steps", str(args.s1),
                  "--config", "configs/llff/fern/fern_epi.txt", "--",
                  "--datadir", args.spec, "--basedir", str(base),
                  "--expname", f"{tag}_s1", "--scan_steps", "50",
                  "--i_print", "5000", "--i_weights", str(args.s1),
                  "--i_testset", "0", "--i_video", "0", "--i_img", "0"]
            + flags,
            base / f"{tag}_s1.log",
        )
        _, t2 = _run_cli(
            py + ["train-stage2", "--max-steps", str(args.s2),
                  "--config", "configs/llff/fern/fern_refine.txt",
                  "--pretrain-path", str(base / f"{tag}_s1"), "--",
                  "--datadir", args.spec, "--basedir", str(base),
                  "--expname", f"{tag}_s2", "--scan_steps", "50",
                  "--i_print", "5000", "--i_weights", str(args.s2),
                  "--i_testset", "0", "--i_video", "0", "--i_img", "0"]
            + flags,
            base / f"{tag}_s2.log",
        )
        ckpt = sorted((base / f"{tag}_s2").glob("*.ckpt"))[-1]
        # eval with the STANDARD serving graph in both arms (bf16 serving
        # is the release default) — only the TRAINING precision differs.
        text, t3 = _run_cli(
            py + ["eval", "--use-trt", "--timing-reps", "20",
                  "--checkpoint", str(ckpt), "--",
                  "--datadir", args.spec, "--basedir", str(base),
                  "--expname", f"{tag}_s2"],
            base / f"{tag}_eval.log",
        )
        emit(args.out, {
            "phase": "quality", "train_precision": tp,
            "schedule": f"{args.s1}+{args.s2}",
            "psnr_rgb1": _grep(text, r"Mean Test PSNR ([0-9.]+)"),
            "ssim": _grep(text, r"Mean Test SSIM ([0-9.]+)"),
            "train_wall_s": round(t1 + t2, 1),
            "eval_wall_s": round(t3, 1),
        })


if __name__ == "__main__":
    main()
