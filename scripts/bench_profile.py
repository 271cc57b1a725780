"""Component-level frame profile at the fern operating point (504x378, 8
samples, 4 views, bf16): where do the ~49 ms go?

Times each pipeline stage standalone at frame shapes (amortized scan,
null-dispatch subtracted) plus whole-frame variants, to direct the next
optimization. Run on the real TPU: `python scripts/bench_profile.py`.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import RenderStatics, init_pronerf_params
    from pronerf_tpu.models.mlp import minmax_mlp_apply, nerf_mlp_apply
    from pronerf_tpu.ops.encoding import plucker, positional_encoding
    from pronerf_tpu.ops.sampling import sort_with_payloads
    from pronerf_tpu.ops.warp import epipolar_colors_shared
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.raygen import rays_for_pose
    from pronerf_tpu.render.renderer import make_frame_renderer
    from pronerf_tpu.utils.profiling import readback
    from pronerf_tpu.utils.synthetic import make_scene

    H, W = 378, 504
    N = H * W
    S, V, E = 8, 4, 48

    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))

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

    rng = np.random.default_rng(0)
    c2w = jnp.asarray(sc["poses"][0])
    rays = jax.jit(lambda c: rays_for_pose(H, W, sc["K"], c))(c2w)
    rays = jax.block_until_ready(rays)
    cdt = jnp.bfloat16

    def vary(x, c):
        return x + c * 1e-30

    # --- components ---
    timed("rays_for_pose", lambda c: rays_for_pose(
        H, W, sc["K"], c2w + c * 1e-30)["ndc_o"][0, 0] + c, jnp.float32(0))

    sig_pts = jnp.asarray(rng.normal(size=(N, E, 3)), jnp.float32)
    nd = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)

    def samp(c):
        sin = plucker(vary(sig_pts, c), nd[:, None, :]).reshape(N, -1)
        out = minmax_mlp_apply(params["sampler"], sin, (), cdt)
        return c + out[0, 0] * 1e-12
    timed("plucker48_plus_sampler_mlp", samp, jnp.float32(0))

    dv = jnp.asarray(rng.uniform(0.01, 0.99, (N, S)), jnp.float32)
    ma = jnp.asarray(rng.normal(size=(N, S)), jnp.float32)

    def srt(c):
        a, b, d = sort_with_payloads(vary(dv, c), ma, ma)
        return c + a[0, 0] * 1e-12
    timed("sort_with_payloads", srt, jnp.float32(0))

    z3d = jnp.asarray(np.sort(rng.uniform(1.0, 20.0, (N, S)), -1), jnp.float32)
    view_ids = jnp.asarray([1, 3, 5, 7], jnp.int32)

    def warp(c):
        cols = epipolar_colors_shared(
            scene["images"], scene["fused_mats"], scene["K"], view_ids,
            vary(rays["or_o"], c), rays["or_d"], z3d,
        )
        return c + cols[0, 0, 0, 0] * 1e-12
    timed("epipolar_shared_gather_unpack", warp, jnp.float32(0))

    rin = jnp.asarray(rng.normal(size=(N, 144)), jnp.float32)

    def refi(c):
        out = minmax_mlp_apply(params["refine"], vary(rin, c), (), cdt)
        return c + out[0, 0] * 1e-12
    timed("refine_mlp", refi, jnp.float32(0))

    qp = jnp.asarray(rng.normal(size=(N, S, 3)), jnp.float32)
    vd = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)

    def nerf_xla(c):
        x_pe = positional_encoding(vary(qp, c), 10)
        d_pe = positional_encoding(vd, 4)
        d_pe = jnp.broadcast_to(d_pe[:, None, :], (N, S, 27))
        raw = nerf_mlp_apply(params["nerf"], x_pe, d_pe, (4,), cdt)
        return c + raw[0, 0, 0] * 1e-12
    timed("pe_plus_nerf_mlp_xla", nerf_xla, jnp.float32(0))

    from pronerf_tpu.kernels.fused_nerf import (
        fused_nerf_raw_t,
        pack_nerf_params,
    )
    from pronerf_tpu.ops.encoding import positional_encoding as pe

    packed = pack_nerf_params(params["nerf"], jnp.bfloat16)
    wv = jnp.asarray(params["nerf"]["views"]["w"])[256:]
    vc = jnp.asarray(
        (np.asarray(pe(vd, 4)) @ np.asarray(wv)).T, jnp.float32
    )
    qp24_t = jnp.transpose(qp.reshape(N, S * 3))

    for br in (1024, 2048):
        def fk(c, br=br):
            raw = fused_nerf_raw_t(
                packed, vary(qp24_t, c), vc, rays_per_block=br
            )
            return c + raw[0, 0, 0] * 1e-12
        timed(f"fused_nerf_raw_t_b{br}", fk, jnp.float32(0))

    # --- whole-frame variants ---
    def frame_variant(name, statics, tile_rays, unroll):
        renderer = make_frame_renderer(
            statics, H, W, sc["K"], tile_rays=tile_rays, unroll=unroll
        )

        def fs(c):
            o = renderer(params, scene, c2w + 1e-7 * c)
            return c + o["rgb1"][0, 0, 0] * 1e-9
        timed(name, fs, jnp.float32(0))

    inf = RenderStatics.infer(compute_dtype="bfloat16")
    frame_variant("frame_bf16_t16384_unroll", inf, 16384, True)
    frame_variant("frame_bf16_t16384_laxmap", inf, 16384, False)
    frame_variant("frame_bf16_t49152_unroll", inf, 49152, True)
    frame_variant("frame_bf16_whole_frame", inf, N, False)
    frame_variant(
        "frame_bf16_pallas_t16384_unroll",
        RenderStatics.infer(compute_dtype="bfloat16", use_pallas=True),
        16384, True,
    )


if __name__ == "__main__":
    main()
