"""Bisect which op of the transposed kernel crashes Mosaic. Each stage adds
ops; run: python scripts/probe_kernel_t.py [stage...]"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

STAGES = sys.argv[1:] or ["s1"]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pronerf_tpu.kernels.fused_nerf import pack_nerf_params
    from pronerf_tpu.models import init_pronerf_params

    params = init_pronerf_params(jax.random.PRNGKey(0))
    packed = pack_nerf_params(params["nerf"], jnp.bfloat16)
    S, RPB = 8, 256
    COLS = RPB * S
    NB = 4
    P = NB * COLS
    rng = np.random.default_rng(0)
    pts_t = jnp.asarray(rng.normal(size=(3, P)), jnp.float32)
    vcon_t = jnp.asarray(rng.normal(size=(128, NB * RPB)), jnp.float32)

    def run(stage):
        names = list(
            ("bx_t", "w0p_t", "b0", "w1_t", "b1", "w_alpha_t", "b_alpha",
             "w_feat_t", "b_feat", "wvf_t", "bv", "w_rgb_t", "b_rgb")
        )
        ws = [packed[n] for n in names]

        def kernel(p_ref, v_ref, *refs):
            (bx_t, w0p_t, b0, w1_t, b1, w_alpha_t, b_alpha,
             w_feat_t, b_feat, wvf_t, bv, w_rgb_t, b_rgb, o_ref) = refs
            cdt = w1_t.dtype

            def mm(w, x):
                return jax.lax.dot_general(
                    w, x.astype(w.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cdt)

            x = p_ref[:].astype(cdt)          # [3, COLS]
            if stage == "s1":                 # tiny-K mm + broadcast out
                xb = mm(bx_t[:], x)           # [30, COLS]
                o_ref[:] = jnp.broadcast_to(
                    xb[:1].astype(jnp.float32), (4, x.shape[1])
                )
                return
            xb = mm(bx_t[:], x)
            sx = jnp.sin(xb.astype(jnp.float32)).astype(cdt)
            cx = jnp.cos(xb.astype(jnp.float32)).astype(cdt)
            pe = jnp.concatenate([x, sx, cx], axis=0)  # [63, COLS]
            if stage == "s2":                 # + sin/cos + sublane concat
                h = mm(w0p_t[:], pe) + b0[:]
                o_ref[:] = jnp.broadcast_to(
                    h[:1].astype(jnp.float32), (4, x.shape[1])
                )
                return
            h = jnp.maximum(mm(w0p_t[:], pe) + b0[:], 0.0)
            h = jnp.maximum(mm(w1_t[:], h) + b1[:], 0.0)
            sigma = mm(w_alpha_t[:], h) + b_alpha[:]   # [8, COLS]
            if stage == "s3":                 # + M=8 head
                o_ref[:] = jnp.broadcast_to(
                    sigma[:1].astype(jnp.float32), (4, x.shape[1])
                )
                return
            feat = mm(w_feat_t[:], h) + b_feat[:]
            vcon = v_ref[:]
            R = RPB
            vcon_p = jnp.broadcast_to(
                vcon[:, :, None].astype(cdt), (128, R, S)
            ).reshape(128, COLS)
            if stage == "s4":                 # + vcon lane-repeat
                hv = jnp.maximum(mm(wvf_t[:], feat) + vcon_p + bv[:], 0.0)
                o_ref[:] = jnp.broadcast_to(
                    hv[:1].astype(jnp.float32), (4, x.shape[1])
                )
                return
            hv = jnp.maximum(mm(wvf_t[:], feat) + vcon_p + bv[:], 0.0)
            rgb = mm(w_rgb_t[:], hv) + b_rgb[:]
            o_ref[:] = jnp.concatenate(
                [rgb[:3], sigma[:1]], axis=0
            ).astype(jnp.float32)             # s5 = full

        full = lambda a: pl.BlockSpec(
            a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
        try:
            out = pl.pallas_call(
                kernel,
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((3, COLS), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, RPB), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ] + [full(w) for w in ws],
                out_specs=pl.BlockSpec((4, COLS), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((4, P), jnp.float32),
            )(pts_t, vcon_t, *ws)
            out.block_until_ready()
            print(stage, "OK", float(out[0, 0]), flush=True)
        except Exception as e:  # noqa: BLE001
            print(stage, "FAIL", str(e)[:160].replace("\n", " "), flush=True)

    for s in STAGES:
        run(s)


if __name__ == "__main__":
    main()
