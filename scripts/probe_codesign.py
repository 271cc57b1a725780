"""Co-design operating-point sweep: serving latency and quality across
(N_samples, num_neighbor).

Why this exists: the exact-parity serving graph at 1008x756 sits at a
MEASURED structural floor (~134 ms on v5e) — the NeRF kernel runs at ~83%
of its bf16 FLOP floor, the 32 windowed gathers at the XLA emitter's
measured optimum, and the ~25 ms of relayout copies are structural to the
emitter (DESIGN.md round-4 findings). The remaining lever the reference
CANNOT pull (its TRT engines are built for fixed dims,
``/root/reference/trt_infer_v2.py:18-20,180,344``) is the operating point
itself: ``N_samples`` and ``num_neighbor`` are config flags here
(``configs/llff/fern/fern_epi.txt:10,29``), every kernel and the trainer
are parameterized over them, and the framework owns training — so a
reduced-point model can be TRAINED and its quality cost MEASURED, not
guessed.

Phases (one process per phase; never run two TPU processes at once):

  python scripts/probe_codesign.py latency
      shapes-only frame timing for each (S, V) variant at 504x378 and
      1008x756, bench.py's exact amortized protocol (random params —
      latency depends on shapes, not weights).

  python scripts/probe_codesign.py quality [--s1 30000] [--s2 15000] \
      [--variants 8x4,6x2]
      trains each variant stage-1 + stage-2 at a MATCHED short schedule on
      the consistent synthetic scene at the fern operating point
      (synthetic:504x378x17) through the released CLI, then evals held-out
      PSNR/SSIM with the bf16 serving graph. The (8,4) control anchors the
      delta; short-schedule deltas are a proxy for full-schedule deltas
      (noted as such wherever reported).

Results append to results/probes_r4_codesign.txt (pass --out to change).
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
sys.path.insert(0, str(REPO))

OUT_DEFAULT = REPO / "results/probes_r4_codesign.txt"


def emit(out_path, obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(out_path, "a") as f:
        f.write(line + "\n")


def phase_latency(args):
    from bench import run_bench

    variants = _parse_variants(args.variants)
    for S, V in variants:
        for H, W, fpl, reps in ((378, 504, 6, 3), (756, 1008, 4, 3)):
            t0 = time.time()
            try:
                ms, rps, null, _single = run_bench(
                    H, W, frames_per_loop=fpl, reps=reps,
                    n_samples=S, num_neighbor=V,
                )
                emit(args.out, {
                    "phase": "latency", "S": S, "V": V, "res": f"{W}x{H}",
                    "ms": round(ms, 2), "mrays_per_sec": round(rps / 1e6, 2),
                    "null_ms": round(null, 2),
                    "wall_s": round(time.time() - t0, 1),
                })
            except Exception as exc:  # keep sweeping past one bad point
                emit(args.out, {
                    "phase": "latency", "S": S, "V": V, "res": f"{W}x{H}",
                    "error": str(exc)[:200],
                })


def _parse_variants(spec: str):
    return [tuple(int(x) for x in v.split("x")) for v in spec.split(",")]


def _run_cli(cmd, log_path):
    log_path = pathlib.Path(log_path)
    ok = log_path.with_suffix(log_path.suffix + ".ok")
    if ok.exists() and log_path.exists():
        print(f"[CODESIGN] skip (done): {' '.join(cmd)}", flush=True)
        return log_path.read_text(), float(ok.read_text() or 0)
    print(f"[CODESIGN] $ {' '.join(cmd)}", flush=True)
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


def phase_quality(args):
    spec = args.spec
    base = REPO / "logs_codesign"
    base.mkdir(exist_ok=True)
    py = [sys.executable, "-m", "pronerf_tpu.cli"]
    # Non-default schedules get suffixed stage-2/eval expdirs + logs so the
    # idempotent .ok skip never collides with a completed default-schedule
    # leg. Stage-1 DELIBERATELY shares its expdir across schedules: the
    # trainer auto-resumes from the newest checkpoint. NOTE the trainer's
    # --max-steps is MARGINAL after a resume (loop.py: n_iters = start +
    # max_steps + 1), so --s1 60000 on top of a completed 30k leg trains to
    # step 90000 and stage-2 bootstraps from that final checkpoint — the
    # emitted "schedule" field reflects the flags, not the absolute step;
    # both arms extend identically so the comparison stays matched.
    default_sched = (args.s1, args.s2) == (30000, 15000)
    sfx = "" if default_sched else f"_{args.s1}p{args.s2}"
    for S, V in _parse_variants(args.variants):
        tag = f"s{S}v{V}"
        flags = ["--N_samples", str(S), "--num_neighbor", str(V)]
        s1dir = f"{tag}_s1"
        # --s1-cmd-steps: the MARGINAL step count actually passed to
        # train-stage1, when it must differ from the nominal --s1 used for
        # naming/labeling. Needed to keep arms matched after a crash: if
        # one arm's stage-1 died mid-leg and left a checkpoint, resuming
        # with the nominal marginal count would overshoot the other arm's
        # absolute endpoint (max-steps is marginal on resume, see above).
        s1_cmd = args.s1 if args.s1_cmd_steps is None else args.s1_cmd_steps
        # Checkpoint cadence: default = only at the end (one ckpt); pass
        # --i-weights for long legs so a VM recycle mid-stage-1 can resume
        # with --s1-cmd-steps = remaining instead of restarting from zero.
        i_w = args.i_weights if args.i_weights else s1_cmd
        _, t1 = _run_cli(
            py + ["train-stage1", "--max-steps", str(s1_cmd),
                  "--config", "configs/llff/fern/fern_epi.txt", "--",
                  "--datadir", spec, "--basedir", str(base),
                  "--expname", s1dir, "--scan_steps", "50",
                  "--i_print", "5000", "--i_weights", str(i_w),
                  "--i_testset", "0", "--i_video", "0", "--i_img", "0"]
            + flags,
            base / f"{tag}_s1{sfx}.log",
        )
        _, t2 = _run_cli(
            py + ["train-stage2", "--max-steps", str(args.s2),
                  "--config", "configs/llff/fern/fern_refine.txt",
                  "--pretrain-path", str(base / s1dir), "--",
                  "--datadir", spec, "--basedir", str(base),
                  "--expname", f"{tag}_s2{sfx}", "--scan_steps", "50",
                  "--i_print", "5000", "--i_weights", str(args.s2),
                  "--i_testset", "0", "--i_video", "0", "--i_img", "0"]
            + flags,
            base / f"{tag}_s2{sfx}.log",
        )
        ckpt = sorted((base / f"{tag}_s2{sfx}").glob("*.ckpt"))[-1]
        text, t3 = _run_cli(
            py + ["eval", "--use-trt", "--timing-reps", "20",
                  "--checkpoint", str(ckpt), "--",
                  "--datadir", spec, "--basedir", str(base),
                  "--expname", f"{tag}_s2{sfx}"] + flags,
            base / f"{tag}_eval{sfx}.log",
        )
        # First "Mean Test PSNR" line is rgb1 (NeRF output), second rgb0.
        psnr = _grep_float(text, r"Mean Test PSNR ([0-9.]+)")
        ssim = _grep_float(text, r"Mean Test SSIM ([0-9.]+)")
        ms = _grep_float(
            text, r"Steady-state render ms/frame [^:]*: (-?[0-9.]+)"
        )
        emit(args.out, {
            "phase": "quality", "S": S, "V": V, "schedule":
            f"{args.s1}+{args.s2}", "psnr_rgb1": psnr, "ssim": ssim,
            "serving_ms_504x378": ms,
            "train_wall_s": round(t1 + t2, 1), "eval_wall_s": round(t3, 1),
        })


def _grep_float(text, pat):
    m = re.search(pat, text)
    return float(m.group(1)) if m else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["latency", "quality"])
    ap.add_argument("--variants", default="8x4,8x2,6x4,6x2,4x2")
    ap.add_argument("--s1", type=int, default=30000)
    ap.add_argument("--s2", type=int, default=15000)
    ap.add_argument("--i-weights", type=int, default=0, dest="i_weights",
                    help="stage-1 checkpoint cadence (0 = only at the end)")
    ap.add_argument("--s1-cmd-steps", type=int, default=None, dest="s1_cmd_steps",
                    help="marginal steps actually passed to train-stage1 "
                         "(naming/labels still use --s1); for matched resume "
                         "after a crash")
    ap.add_argument("--spec", default="synthetic:504x378x17")
    ap.add_argument("--out", default=str(OUT_DEFAULT))
    args = ap.parse_args()
    if args.phase == "latency":
        phase_latency(args)
    else:
        if args.variants == "8x4,8x2,6x4,6x2,4x2":
            args.variants = "8x4,6x2"  # quality default: control + candidate
        phase_quality(args)


if __name__ == "__main__":
    main()
