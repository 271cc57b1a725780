"""TPU A/B: int8 fused NeRF kernel (kernels/fused_nerf_q.py) vs the bf16
kernel — standalone at frame-scale point counts, then whole-frame serving
at both operating points. Amortized-scan timing minus the measured null
dispatch (the only honest protocol through the axon tunnel).

Usage: python scripts/bench_int8.py [kernel|frame|frame_fullres|all]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ARGS = sys.argv[1:] or ["all"]


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from pronerf_tpu.kernels.fused_nerf import (
        fused_nerf_raw_t,
        pack_nerf_params,
    )
    from pronerf_tpu.kernels.fused_nerf_q import (
        fused_nerf_raw_tq,
        pack_nerf_params_int8,
    )
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.utils.profiling import (
        amortized_timer,
        null_dispatch_ms,
        readback,
    )

    params = init_pronerf_params(jax.random.PRNGKey(0))
    null = null_dispatch_ms()
    print(json.dumps({"dispatch_null_ms": round(null, 2)}), flush=True)

    want = set(ARGS)
    run_all = "all" in want

    if run_all or "kernel" in want:
        rng = np.random.default_rng(0)
        for N in (190512, 762048):  # 504x378 and 1008x756 ray counts
            p24 = jnp.asarray(
                rng.uniform(-1, 1, size=(24, N)), jnp.float32
            )
            vc = jnp.asarray(rng.normal(size=(128, N)), jnp.float32)

            for name, pk, fn in (
                ("bf16", pack_nerf_params(params["nerf"]), fused_nerf_raw_t),
                ("int8", pack_nerf_params_int8(params["nerf"]),
                 fused_nerf_raw_tq),
            ):
                pk = jax.tree.map(jnp.asarray, pk)

                def step(c, fn=fn, pk=pk, p24=p24, vc=vc):
                    out = fn(pk, c, vc, rays_per_block=4096)
                    return c * (1.0 + 1e-12 * out[0, 0, 0])

                try:
                    t0 = time.perf_counter()
                    readback(step(p24))  # compile
                    compile_s = time.perf_counter() - t0
                    ms = amortized_timer(step, p24, iters=8, null_ms=null)
                    print(json.dumps({
                        "standalone": name, "N": N,
                        "ms": round(float(ms), 2),
                        "compile_s": round(compile_s, 1),
                    }), flush=True)
                except Exception as exc:
                    print(json.dumps({
                        "standalone": name, "N": N,
                        "error": str(exc)[:300],
                    }), flush=True)
                    if name == "int8":
                        return  # Mosaic rejected int8 — stop here

    if run_all or "frame" in want or "frame_fullres" in want:
        from pronerf_tpu.config import Config
        from pronerf_tpu.cli import DEFAULT_TRT_CONFIG
        from pronerf_tpu.models import RenderStatics
        from pronerf_tpu.render import prepare_scene
        from pronerf_tpu.render.infer import _infer_statics
        from pronerf_tpu.render.renderer import make_frame_renderer
        from pronerf_tpu.utils.synthetic import make_scene

        points = []
        if run_all or "frame" in want:
            points.append((378, 504))
        if run_all or "frame_fullres" in want:
            points.append((756, 1008))
        for H, W in points:
            sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
            scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
            c2w = jnp.asarray(sc["poses"][0])
            for quant in ("none", "int8"):
                cfg = Config.from_file(
                    DEFAULT_TRT_CONFIG, datadir="synthetic", use_trt=True,
                    tile_rays=0, use_pallas=True, quant=quant,
                )
                statics = _infer_statics(cfg, use_bf16=True)
                renderer = make_frame_renderer(
                    statics, H, W, sc["K"], tile_rays=0, unroll=True
                )
                try:
                    t0 = time.perf_counter()
                    out = renderer(params, scene, c2w)
                    readback(out["rgb1"])
                    compile_s = time.perf_counter() - t0
                    rgb = np.asarray(out["rgb1"])
                    assert np.all(np.isfinite(rgb))

                    def fstep(c, renderer=renderer):
                        o = renderer(params, scene, c2w + 1e-7 * c)
                        return c + o["rgb1"][0, 0, 0] * 1e-9

                    ms = float(np.median([
                        amortized_timer(fstep, jnp.float32(0), iters=4,
                                        null_ms=null)
                        for _ in range(3)
                    ]))
                    print(json.dumps({
                        "frame": f"{W}x{H}", "quant": quant,
                        "ms": round(ms, 2),
                        "mrays_per_s": round(H * W / ms / 1e3, 2),
                        "rgb_mean": round(float(rgb.mean()), 4),
                        "compile_s": round(compile_s, 1),
                    }), flush=True)
                except Exception as exc:
                    print(json.dumps({
                        "frame": f"{W}x{H}", "quant": quant,
                        "error": str(exc)[:300],
                    }), flush=True)


if __name__ == "__main__":
    main()
