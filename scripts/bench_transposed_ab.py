"""A/B: transposed serving pipeline (models/pronerf_t.py) vs the row-major
serving graph, at both reference operating points, in ONE process (the
tunnel's run-to-run drift makes cross-process comparisons unreliable —
DESIGN.md "Measurement discipline").

Usage: python scripts/bench_transposed_ab.py [504 full]
Prints one JSON line per (resolution, variant).
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

POINTS = sys.argv[1:] or ["504", "full"]


def bench_variant(H, W, transposed: bool, frames=6, reps=4):
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.cli import DEFAULT_TRT_CONFIG
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

    cfg = Config.from_file(
        DEFAULT_TRT_CONFIG, datadir="synthetic", use_trt=True, tile_rays=0,
        use_pallas=True, transposed=transposed,
    )
    statics = _infer_statics(cfg, use_bf16=True)
    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    renderer = make_frame_renderer(statics, H, W, sc["K"], tile_rays=0,
                                   unroll=True)
    c2w = jnp.asarray(sc["poses"][0])
    out = renderer(params, scene, c2w)
    readback(out["rgb1"])
    assert np.all(np.isfinite(np.asarray(out["rgb1"])))
    null = null_dispatch_ms()

    def frame_step(c):
        o = renderer(params, scene, c2w + 1e-7 * c)
        return c + o["rgb1"][0, 0, 0] * 1e-9

    samples = [
        amortized_timer(frame_step, jnp.float32(0), iters=frames, null_ms=null)
        for _ in range(reps)
    ]
    ms = float(np.median(samples))
    print(json.dumps({
        "point": f"{W}x{H}", "transposed": transposed,
        "ms_per_frame": round(ms, 2),
        "mrays_per_sec": round(H * W / ms / 1e3, 2),
        "null_ms": round(null, 1),
        "samples": [round(s, 2) for s in samples],
    }), flush=True)
    return ms


def main():
    from pronerf_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    for point in POINTS:
        H, W = (378, 504) if point == "504" else (756, 1008)
        frames = 6 if point == "504" else 4
        # one variant at a time, interleaved order robust to slow drift
        a = bench_variant(H, W, transposed=False, frames=frames)
        b = bench_variant(H, W, transposed=True, frames=frames)
        print(json.dumps({
            "point": f"{W}x{H}",
            "speedup_transposed": round(a / b, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
