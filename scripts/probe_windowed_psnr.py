"""Quantify the windowed epipolar gather's coverage-miss approximation at
the full-res serving point (VERDICT r3 weak-2 / next-2).

The auto windowed gather (8 tiles, ~198-row windows at 1008x756) covers
~99.75% of in-bounds projections; the remaining ~0.25% mean-fill as if
out-of-image (r3: results/probes_r3/window_sweep_fullres.txt). The
reference's warp is exact everywhere in-image
(``inverse_warp.py:558-579``). This renders the SAME trained weights
(the committed full-schedule soak checkpoint) on the SAME scene at
1008x756 under:

  auto      : the serving default (resolve_gather_statics)
  exact     : unwindowed (gather_tiles=0) — the parity-exact graph
  tiles16   : 16-tile windowed (coverage 1.0 in the r3 sweep)

and reports render-vs-render PSNR (the approximation error itself) plus
PSNR vs the synthetic GT for each, on every held-out view.

Usage: python scripts/probe_windowed_psnr.py [--res 1008x756] [--views 17]
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CKPT = REPO / "results/soak/s2/370000.ckpt"


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def main():
    res = "1008x756"
    n_views = 17
    for i, a in enumerate(sys.argv[1:], 1):
        if a == "--res":
            res = sys.argv[i + 1]
        if a == "--views":
            n_views = int(sys.argv[i + 1])
    W, H = (int(x) for x in res.split("x"))

    from pronerf_tpu.cli import DEFAULT_TRT_CONFIG, enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.config import Config
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.infer import _infer_statics
    from pronerf_tpu.render.renderer import (
        make_frame_renderer,
        resolve_gather_statics,
    )
    from pronerf_tpu.train.loop import load_params_for_inference
    from pronerf_tpu.utils.profiling import readback
    from pronerf_tpu.utils.synthetic import make_consistent_scene

    cfg = Config.from_file(
        DEFAULT_TRT_CONFIG, datadir=f"synthetic:{res}x{n_views}",
        use_trt=True, tile_rays=0, use_pallas=True,
    )
    base = _infer_statics(cfg, use_bf16=True)

    sc = make_consistent_scene(
        n_views=n_views, H=H, W=W, focal=0.875 * W, seed=cfg.seed
    )
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(cfg.seed))
    params = load_params_for_inference(str(CKPT), params)
    i_test = np.arange(n_views)[:: cfg.llffhold]

    auto = resolve_gather_statics(base, H, W, H * W)
    variants = {
        "auto": auto,
        "exact": dataclasses.replace(base, gather_tiles=0),
        "tiles16": dataclasses.replace(
            base, gather_tiles=16,
            gather_window_rows=auto.gather_window_rows,
        ),
    }
    renders = {}
    for name, st in variants.items():
        renderer = make_frame_renderer(st, H, W, sc["K"], tile_rays=0,
                                       unroll=True)
        frames = []
        for ti in i_test:
            out = renderer(params, scene, jnp.asarray(sc["poses"][ti]))
            readback(out["rgb1"])
            frames.append(np.asarray(out["rgb1"], np.float32))
        renders[name] = frames
        gt_psnrs = [psnr(f, sc["images"][ti])
                    for f, ti in zip(frames, i_test)]
        print(json.dumps({
            "variant": name,
            "gather_tiles": st.gather_tiles if name != "auto"
            else auto.gather_tiles,
            "window_rows": auto.gather_window_rows,
            "psnr_vs_gt_per_view": [round(p, 3) for p in gt_psnrs],
            "psnr_vs_gt_mean": round(float(np.mean(gt_psnrs)), 3),
        }), flush=True)

    for name in ("auto", "tiles16"):
        deltas = [psnr(a, b)
                  for a, b in zip(renders[name], renders["exact"])]
        frac = [float(np.mean(np.abs(a - b) > 1.0 / 255.0))
                for a, b in zip(renders[name], renders["exact"])]
        print(json.dumps({
            "compare": f"{name}_vs_exact",
            "render_psnr_per_view": [round(p, 2) for p in deltas],
            "render_psnr_min": round(float(np.min(deltas)), 2),
            "pixels_off_gt_1_255": round(float(np.mean(frac)), 6),
        }), flush=True)
    print("EXIT:0", flush=True)


if __name__ == "__main__":
    main()
