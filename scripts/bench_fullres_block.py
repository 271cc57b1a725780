"""Full-res serving A/B: sweep pallas_block_rays (and optionally
gather_window_rows) at 1008x756 — the reference's engine operating point.

Rationale: the round-2/3 block sweep picked 4096 at 504x378 (1.5 M
points/frame); at full res (6.1 M points) the grid has 4x the steps, so a
bigger ray block amortizes per-step fixed costs — if the ~12-14 MB VMEM
footprint at 8192 lanes still fits. One variant per JSON line.

Usage: python scripts/bench_fullres_block.py [block ...]   (default 4096 8192)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

BLOCKS = [int(b) for b in sys.argv[1:]] or [4096, 8192]


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.cli import DEFAULT_TRT_CONFIG, enable_compilation_cache
    from pronerf_tpu.config import Config
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.infer import _infer_statics
    from pronerf_tpu.render.renderer import make_frame_renderer
    from pronerf_tpu.utils.profiling import (
        amortized_timer,
        null_dispatch_ms,
        readback,
    )
    from pronerf_tpu.utils.synthetic import make_scene

    enable_compilation_cache()
    H, W = 756, 1008
    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    c2w = jnp.asarray(sc["poses"][0])
    null = null_dispatch_ms()
    print(json.dumps({"null_ms": round(null, 1)}), flush=True)

    import dataclasses

    for block in BLOCKS:
        cfg = Config.from_file(
            DEFAULT_TRT_CONFIG, datadir="synthetic", use_trt=True,
            tile_rays=0, use_pallas=True,
        )
        statics = dataclasses.replace(
            _infer_statics(cfg, use_bf16=True), pallas_block_rays=block
        )
        renderer = make_frame_renderer(
            statics, H, W, sc["K"], tile_rays=0, unroll=True
        )
        t0 = time.time()
        try:
            readback(renderer(params, scene, c2w)["rgb1"])
        except Exception as exc:
            print(json.dumps({"block": block,
                              "error": str(exc)[:200]}), flush=True)
            continue
        compile_s = round(time.time() - t0, 1)

        def step(c, r=renderer):
            o = r(params, scene, c2w + 1e-7 * c)
            return c + o["rgb1"][0, 0, 0] * 1e-9

        samples = [
            amortized_timer(step, jnp.float32(0), iters=4, null_ms=null)
            for _ in range(3)
        ]
        ms = float(np.median(samples))
        print(json.dumps({
            "block": block, "ms_per_frame": round(ms, 2),
            "mrays_per_sec": round(H * W / ms / 1e3, 2),
            "compile_s": compile_s,
        }), flush=True)


if __name__ == "__main__":
    main()
