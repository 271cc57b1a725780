"""Attribution probe for the rgb0 collapse seen in the release rehearsal
(results/rehearsal_fern.json: eval_psnr_rgb0 8.82 vs rgb1 29.37).

Mechanism under test (proved topology-identical to the reference by
tests/test_reference_parity.py::test_stage2_loss_topology_matches_reference):
with the release config's ``a_mmrgb = 0`` (configs/llff/fern/
fern_refine.txt, mirroring ``run_S_eS_eN_alter_base_refine2.py:859-866``),
the stage-2 loss is mse(rgb1) only, so the refine net's RGB head and the
sampler's mm_rgb head get EXACTLY zero gradient while their shared trunks
keep moving under depth/offset/density gradients — rgb0 is a frozen head
reading shifting features and drifts unsupervised, BY CONSTRUCTION of the
reference's loss.

This probe demonstrates the dynamics end to end through the released CLI
(small synthetic scene — the mechanism is scale-free; runs on the
attached TPU by default, a few minutes there vs hours on this host's
single CPU core), three stage-2 arms from one stage-1 checkpoint:

  baseline  --max-steps 1            rgb0 right after bootstrap
  drift     --max-steps N, a_mmrgb 0      release config: rgb0 collapses
  control   --max-steps N, a_mmrgb 1e-3   supervised: rgb0 holds, rgb1
                                          statistically unaffected

Results append to results/probes_r5_rgb0.txt. Verdict: if drift-arm rgb0
falls far below baseline while control-arm rgb0 holds AND the two arms'
rgb1 agree, the rehearsal's 8.8 dB is faithful reference behavior, not a
wiring bug.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT_DEFAULT = REPO / "results/probes_r5_rgb0.txt"


def emit(out_path, obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(out_path, "a") as f:
        f.write(line + "\n")


def _run_cli(cmd, log_path, env):
    log_path = pathlib.Path(log_path)
    ok = log_path.with_suffix(log_path.suffix + ".ok")
    if ok.exists() and log_path.exists():
        print(f"[RGB0] skip (done): {' '.join(cmd)}", flush=True)
        return log_path.read_text(), float(ok.read_text() or 0)
    print(f"[RGB0] $ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          env=env)
    text = proc.stdout + proc.stderr
    log_path.write_text(text)
    dt = time.time() - t0
    if proc.returncode != 0:
        print(text[-3000:])
        raise SystemExit(f"stage failed rc={proc.returncode} ({dt:.0f}s)")
    ok.write_text(f"{dt:.1f}")
    return text, dt


def _psnrs(text):
    """render_path prints rgb1's mean first, rgb0's second."""
    vals = re.findall(r"Mean Test PSNR ([0-9.]+)", text)
    return (float(vals[0]) if vals else None,
            float(vals[1]) if len(vals) > 1 else None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="synthetic:64x48x9")
    ap.add_argument("--s1", type=int, default=1200)
    ap.add_argument("--s2", type=int, default=800)
    ap.add_argument("--out", default=str(OUT_DEFAULT))
    ap.add_argument("--platform", default=None,
                    help="JAX_PLATFORMS override for the child CLIs. "
                    "Stage-1 exploration steps are ~80 GFLOP each at the "
                    "default scale — hours on this box's ONE cpu core — "
                    "so the default inherits the env (the TPU when "
                    "attached); never run concurrently with another TPU "
                    "process")
    args = ap.parse_args()

    env = dict(os.environ)
    if args.platform:
        env["JAX_PLATFORMS"] = args.platform
    base = REPO / "logs_rgb0"
    base.mkdir(exist_ok=True)
    py = [sys.executable, "-m", "pronerf_tpu.cli"]
    common = ["--datadir", args.spec, "--basedir", str(base),
              "--N_rand", "1024", "--scan_steps", "50",
              "--i_print", "1000", "--i_testset", "0", "--i_video", "0",
              "--i_img", "0"]

    _run_cli(
        py + ["train-stage1", "--max-steps", str(args.s1),
              "--config", "configs/llff/fern/fern_epi.txt", "--",
              "--expname", "s1", "--i_weights", str(args.s1)] + common,
        base / "s1.log", env,
    )

    arms = [("baseline", 1, 0.0), ("drift", args.s2, 0.0),
            ("control", args.s2, 1e-3)]
    rows = {}
    for name, steps, a in arms:
        _run_cli(
            py + ["train-stage2", "--max-steps", str(steps),
                  "--config", "configs/llff/fern/fern_refine.txt",
                  "--pretrain-path", str(base / "s1"), "--",
                  "--expname", f"s2_{name}", "--a_mmrgb", str(a),
                  "--i_weights", str(steps)] + common,
            base / f"s2_{name}.log", env,
        )
        ckpt = sorted((base / f"s2_{name}").glob("*.ckpt"))[-1]
        text, _ = _run_cli(
            py + ["eval", "--checkpoint", str(ckpt), "--",
                  "--expname", f"s2_{name}"] + common,
            base / f"eval_{name}.log", env,
        )
        rgb1, rgb0 = _psnrs(text)
        rows[name] = {"rgb1": rgb1, "rgb0": rgb0}
        emit(args.out, {
            "phase": "rgb0_drift", "arm": name, "s2_steps": steps,
            "a_mmrgb": a, "psnr_rgb1": rgb1, "psnr_rgb0": rgb0,
            "spec": args.spec, "s1_steps": args.s1,
        })

    b, d, c = rows["baseline"], rows["drift"], rows["control"]
    verdict = {
        "phase": "verdict",
        "rgb0_drop_unsupervised_db": round(b["rgb0"] - d["rgb0"], 2),
        "rgb0_drop_supervised_db": round(b["rgb0"] - c["rgb0"], 2),
        "rgb1_arm_gap_db": round(d["rgb1"] - c["rgb1"], 2),
        "faithful_drift": bool(
            (b["rgb0"] - d["rgb0"]) > 3.0
            and (b["rgb0"] - c["rgb0"]) < 1.0
            and abs(d["rgb1"] - c["rgb1"]) < 1.0
        ),
    }
    emit(args.out, verdict)


if __name__ == "__main__":
    main()
