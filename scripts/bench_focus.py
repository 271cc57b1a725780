"""Focused frame-variant profile: whole-frame XLA vs whole-frame Pallas at
the fern operating point. Run on the real TPU; each variant costs ~1-2 min
of remote compile, so this times only what the next decision needs."""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

VARIANTS = sys.argv[1:] or [
    "frame_whole_xla", "frame_whole_pallas_b512", "frame_whole_pallas_b1024",
]


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import RenderStatics, init_pronerf_params
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.renderer import make_frame_renderer
    from pronerf_tpu.utils.profiling import readback
    from pronerf_tpu.utils.synthetic import make_scene

    H, W = 378, 504
    N = H * W

    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    c2w = jnp.asarray(sc["poses"][0])

    def null_ms(reps=5):
        f0 = jax.jit(lambda x: x + 1.0)
        readback(f0(jnp.zeros(())))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            readback(f0(jnp.zeros(())))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    null = null_ms()
    print(json.dumps({"dispatch_null_ms": round(null, 2)}), flush=True)

    def timed(name, step, c0, iters=4, reps=3):
        try:
            @jax.jit
            def loop(c):
                def body(c, _):
                    return step(c), ()
                c, _ = jax.lax.scan(body, c, None, length=iters)
                return c

            readback(loop(c0))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                readback(loop(c0))
                ts.append((time.perf_counter() - t0) * 1e3)
            ms = (float(np.median(ts)) - null) / iters
            print(json.dumps({"variant": name, "ms": round(ms, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)

    def frame_variant(name, statics, tile_rays, unroll):
        renderer = make_frame_renderer(
            statics, H, W, sc["K"], tile_rays=tile_rays, unroll=unroll
        )

        def fs(c):
            o = renderer(params, scene, c2w + 1e-7 * c)
            return c + o["rgb1"][0, 0, 0] * 1e-9
        timed(name, fs, jnp.float32(0))

    inf = RenderStatics.infer(compute_dtype="bfloat16")

    def infp(b):
        return RenderStatics.infer(
            compute_dtype="bfloat16", use_pallas=True, pallas_block_rays=b
        )

    table = {
        "frame_whole_xla": lambda: frame_variant(
            "frame_whole_xla", inf, N, True),
        "frame_t16384_xla": lambda: frame_variant(
            "frame_t16384_xla", inf, 16384, True),
        # block = ray COLUMNS per grid step (one sample per step)
        "frame_whole_pallas_b1024": lambda: frame_variant(
            "frame_whole_pallas_b1024", infp(1024), N, True),
        "frame_whole_pallas_b2048": lambda: frame_variant(
            "frame_whole_pallas_b2048", infp(2048), N, True),
        "frame_whole_pallas_b4096": lambda: frame_variant(
            "frame_whole_pallas_b4096", infp(4096), N, True),
    }
    for v in VARIANTS:
        table[v]()


if __name__ == "__main__":
    main()
