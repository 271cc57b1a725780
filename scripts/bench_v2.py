"""Standalone fused_nerf_raw timings at frame scale, single-call
null-subtracted. Usage: python scripts/bench_v2.py [b128 b256 xla]"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ARGS = sys.argv[1:] or ["b256"]


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.kernels.fused_nerf import (
        fused_nerf_raw_t,
        pack_nerf_params,
    )
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.models.mlp import nerf_mlp_apply
    from pronerf_tpu.ops.encoding import positional_encoding
    from pronerf_tpu.utils.profiling import readback

    params = init_pronerf_params(jax.random.PRNGKey(0))
    packed = pack_nerf_params(params["nerf"], jnp.bfloat16)
    N, S = 190512, 8
    rng = np.random.default_rng(0)
    qp = jnp.asarray(rng.normal(size=(N, S, 3)), jnp.float32)
    vd = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    wv = jnp.asarray(params["nerf"]["views"]["w"])[256:]
    vc = jnp.asarray((positional_encoding(vd, 4) @ wv).T, jnp.float32)
    qp24_t = jnp.transpose(qp.reshape(N, S * 3))

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

    def timed(name, fn, reps=7):
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

    for tag in ARGS:
        if tag == "xla":
            @jax.jit
            def xla_fwd(c):
                x_pe = positional_encoding(qp + c * 1e-30, 10)
                d_pe = positional_encoding(vd, 4)
                raw = nerf_mlp_apply(
                    params["nerf"], x_pe, d_pe, (4,), jnp.bfloat16
                )
                return raw[0, 0, 0]
            timed("xla_serving_fwd", xla_fwd)
        else:
            rpb = int(tag[1:])

            @jax.jit
            def v2(c, rpb=rpb):
                raw = fused_nerf_raw_t(
                    packed, qp24_t + c * 1e-30, vc, rays_per_block=rpb
                )
                return raw[0, 0, 0]
            timed(f"fused_raw_t_{tag}", v2)


if __name__ == "__main__":
    main()
