"""V=2 quality-recovery candidate: derive the fast (S=8, V=2) operating
point FROM the trained (S=8, V=4) control instead of training it from
scratch (VERDICT r4 next-1d: "recover quality at V=2 ... fine-tune the
V=4 control checkpoint at V=2").

Only the refine net's FIRST layer depends on V (input =
[Pluecker 6S=48ch || epi colors 3*V*S], view-major in the stage-2/infer
'vsc' layout — models/pronerf.py:479); the sampler and NeRF are
V-independent. And eval-time neighbor selection is nearest-first
(run_S_eS_eN_alter_base_refine2.py nearest `num_neighbor`), so the 2
views a V=2 model sees are a PREFIX of the control's 4. The surgery:

  W1' = [ W1[plk rows 0:48] ;  scale * W1[epi rows of views 0,1] ]

with scale=2 approximating the lost half of the view-sum (warped colors
of the same 3D point are highly correlated across views), then a SHORT
stage-2 fine-tune at V=2 repairs the residual. Deployment story if this
wins: train the V=4 control once, derive the fast point in minutes —
something the reference's fixed-dim TRT engines cannot express at all.

Phases (idempotent):
  surgery   V=4 stage-2 ckpt -> V=2 stage-1-layout bootstrap ckpt
  finetune  train-stage2 at V=2 from the surgery ckpt (--steps)
  eval      bf16 serving eval, appended to results/probes_r5_surgery.txt

Usage:
  python scripts/probe_v2_surgery.py \
      [--src logs_codesign/s8v4_s2_120000p60000] [--steps 15000]
      [--scale 2.0] [--spec synthetic:504x378x17]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT_DEFAULT = REPO / "results/probes_r5_surgery.txt"
S = 8


def emit(out_path, obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(out_path, "a") as f:
        f.write(line + "\n")


def do_surgery(src, dst, scale: float, views: int = 2):
    import jax

    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from pronerf_tpu.train.loop import stage1_ckpt
    from pronerf_tpu.train.stage1 import init_stage1_state

    src = pathlib.Path(src)
    if src.is_dir():
        src = latest_checkpoint(src)
    raw = load_checkpoint(src)  # relistified state dict
    nerf = raw.get("network_fine", raw.get("network_fn"))
    sampler = raw["mmr_network_fn"]
    refine4 = raw["refine_net"]

    w1 = np.asarray(refine4["layers"][0]["w"])  # [48 + 3*4*S, 256]
    assert w1.shape[0] == 6 * S + 3 * 4 * S, w1.shape
    plk_rows = w1[: 6 * S]
    # vsc layout: per-view blocks of S*3 rows, nearest views first; a
    # V<4 model's views are a prefix of the teacher's 4
    epi = w1[6 * S: 6 * S + views * (3 * S)]
    w1_v2 = np.concatenate([plk_rows, scale * epi], axis=0)

    # template with V=views shapes; overwrite every net with the trained
    # ones
    params = init_pronerf_params(jax.random.PRNGKey(0),
                                 num_neighbor=views)
    params["nerf"] = jax.tree_util.tree_map(np.asarray, nerf)
    params["sampler"] = jax.tree_util.tree_map(np.asarray, sampler)
    refine2 = jax.tree_util.tree_map(np.asarray, refine4)
    refine2["layers"] = list(refine2["layers"])
    refine2["layers"][0] = dict(refine2["layers"][0], w=w1_v2)
    params["refine"] = refine2

    state = init_stage1_state(params, 0.0)
    ck = stage1_ckpt(state)
    ck["global_step"] = np.int32(0)
    dst.parent.mkdir(parents=True, exist_ok=True)
    save_checkpoint(dst, ck)
    print(f"[SURGERY] {src} -> {dst} (scale={scale})")
    return dst


def _run_cli(cmd, log_path):
    log_path = pathlib.Path(log_path)
    ok = log_path.with_suffix(log_path.suffix + ".ok")
    if ok.exists() and log_path.exists():
        print(f"[SURGERY] skip (done): {' '.join(cmd[:6])} ...", flush=True)
        return log_path.read_text(), float(ok.read_text() or 0)
    print(f"[SURGERY] $ {' '.join(cmd)}", flush=True)
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
    ap.add_argument("--src", default="logs_codesign/s8v4_s2_120000p60000")
    ap.add_argument("--steps", type=int, default=15000)
    ap.add_argument("--scale", type=float, default=None,
                    help="epipolar first-layer rescale; default 4/views")
    ap.add_argument("--views", type=int, default=2,
                    help="target num_neighbor (< 4); 2 = the fast point, "
                    "3 = the intermediate latency/quality trade")
    ap.add_argument("--spec", default="synthetic:504x378x17")
    ap.add_argument("--out", default=str(OUT_DEFAULT))
    args = ap.parse_args()
    if args.scale is None:
        args.scale = 4.0 / args.views

    base = REPO / "logs_codesign"
    tag = (f"surgery_v2_sc{args.scale:g}" if args.views == 2
           else f"surgery_v{args.views}_sc{args.scale:g}")
    ck = base / f"{tag}.ckpt"
    if not ck.exists():
        do_surgery(REPO / args.src, ck, args.scale, args.views)

    py = [sys.executable, "-m", "pronerf_tpu.cli"]
    flags = ["--N_samples", str(S), "--num_neighbor", str(args.views)]
    _, t_ft = _run_cli(
        py + ["train-stage2", "--max-steps", str(args.steps),
              "--config", "configs/llff/fern/fern_refine.txt",
              "--pretrain-path", str(ck), "--",
              "--datadir", args.spec, "--basedir", str(base),
              "--expname", f"{tag}_s2", "--scan_steps", "50",
              "--i_print", "5000", "--i_weights", str(args.steps),
              "--i_testset", "0", "--i_video", "0", "--i_img", "0"] + flags,
        base / f"{tag}_s2.log",
    )
    ck_ft = sorted((base / f"{tag}_s2").glob("*.ckpt"))[-1]
    text, t_ev = _run_cli(
        py + ["eval", "--use-trt", "--timing-reps", "20",
              "--checkpoint", str(ck_ft), "--",
              "--datadir", args.spec, "--basedir", str(base),
              "--expname", f"{tag}_s2"] + flags,
        base / f"{tag}_eval.log",
    )
    emit(args.out, {
        "phase": "surgery_v2", "views": args.views, "scale": args.scale,
        "finetune_steps": args.steps, "src": args.src,
        "psnr_rgb1": _grep(text, r"Mean Test PSNR ([0-9.]+)"),
        "ssim": _grep(text, r"Mean Test SSIM ([0-9.]+)"),
        "serving_ms_504x378": _grep(
            text, r"Steady-state render ms/frame [^:]*: (-?[0-9.]+)"),
        "finetune_wall_s": round(t_ft, 1), "eval_wall_s": round(t_ev, 1),
    })


if __name__ == "__main__":
    main()
