"""Fused-kernel cost bisection at frame scale: what does each piece of the
fused NeRF kernel cost on the MXU/VPU?

Variants (all N=190512 rays x 8 samples, bf16 weights):
  chain_bKKK   — pure matmul chain: 9x [P,256]@[256,256] + heads, no PE,
                 no composite, input [P,256] ready-made. The MXU ceiling.
  pe_bKKK      — chain + in-kernel PE from [R,S,3] points (layer-0/5 split
                 dots + sin/cos).
  full_bKKK    — the shipped kernel (PE + view branch + composite).
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ARGS = sys.argv[1:] or ["chain_b256"]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.kernels.fused_nerf import pack_nerf_params
    from pronerf_tpu.utils.profiling import readback

    params = init_pronerf_params(jax.random.PRNGKey(0))
    packed = pack_nerf_params(params["nerf"], jnp.bfloat16)
    N, S, W = 190512, 8, 256
    P = N * S

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

    def timed(name, fn, iters=0, reps=7):
        # single-call timing, null-subtracted (the 745-block pallas grids
        # compile pathologically slowly inside a scan, so no loop here)
        try:
            readback(fn(jnp.float32(0)))
            ts = []
            for i in range(reps):
                t0 = time.perf_counter()
                readback(fn(jnp.float32(i)))
                ts.append((time.perf_counter() - t0) * 1e3)
            ms = float(np.median(ts)) - null
            print(json.dumps({"variant": name, "ms": round(ms, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)

    def dot(x, w):
        return jax.lax.dot_general(
            x, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(w.dtype)

    # ---- pure matmul chain: 9 x 256-wide + view half + rgb ----
    def chain_kernel(x_ref, *refs):
        (w1, b1, w2, b2, w3, b3, w4, b4, w5h, b5, w6, b6, w7, b7,
         w_feat, b_feat, wvf, bv, w_rgb, out_ref) = refs
        h = x_ref[:]
        for w, b in ((w1, b1), (w2, b2), (w3, b3), (w4, b4), (w5h, b5),
                     (w6, b6), (w7, b7)):
            h = jnp.maximum(dot(h, w[:]) + b[:], 0.0)
        feat = dot(h, w_feat[:]) + b_feat[:]
        hv = jnp.maximum(dot(feat, wvf[:]) + bv[:], 0.0)
        out_ref[:] = dot(hv, w_rgb[:]).astype(jnp.float32)

    def _device_x():
        # generate on device — a [P, 256] host array would ship ~780 MB
        # through the tunnel
        return jax.jit(
            lambda k: jax.random.normal(k, (P, W), jnp.bfloat16)
        )(jax.random.PRNGKey(0))

    def run_chain(rows):
        x = _device_x()
        names = ("w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4",
                 "w5h", "b5", "w6", "b6", "w7", "b7",
                 "w_feat", "b_feat", "wvf", "bv", "w_rgb")
        ws = [packed[n] for n in names]
        nb = -(-P // rows)
        pad = nb * rows - P
        xp = jnp.pad(x, ((0, pad), (0, 0)))

        full = lambda a: pl.BlockSpec(
            a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

        @jax.jit
        def call(xp):
            return pl.pallas_call(
                chain_kernel,
                grid=(nb,),
                in_specs=[pl.BlockSpec((rows, W), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)]
                + [full(w) for w in ws],
                out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb * rows, 128), jnp.float32),
            )(xp, *ws)

        def step(c):
            o = call(xp + c.astype(jnp.bfloat16) * 1e-30)
            return c + o[0, 0] * 1e-9
        timed(f"chain_rows{rows}", step)

    # ---- XLA equivalent of the chain for a fair comparison ----
    def run_chain_xla():
        x = _device_x()
        names = ("w1", "w2", "w3", "w4", "w5h", "w6", "w7")
        ws = [packed[n] for n in names]
        bs = [packed[n] for n in ("b1", "b2", "b3", "b4", "b5", "b6", "b7")]

        @jax.jit
        def call(x):
            h = x
            for w, b in zip(ws, bs):
                h = jnp.maximum(dot(h, w) + b, 0.0)
            feat = dot(h, packed["w_feat"]) + packed["b_feat"]
            hv = jnp.maximum(dot(feat, packed["wvf"]) + packed["bv"], 0.0)
            return dot(hv, packed["w_rgb"]).astype(jnp.float32)

        def step(c):
            o = call(x + c.astype(jnp.bfloat16) * 1e-30)
            return c + o[0, 0] * 1e-9
        timed("chain_xla", step)

    for tag in ARGS:
        if tag == "chain_xla":
            run_chain_xla()
        elif tag.startswith("chain_rows"):
            run_chain(int(tag[len("chain_rows"):]))


if __name__ == "__main__":
    main()
