"""Standalone fused-NeRF kernel timings at frame scale (N=190512): current
kernel vs the round-1 kernel, across block sizes. Diagnoses why the embedded
whole-frame Pallas variant underperforms."""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ARGS = sys.argv[1:] or ["cur_b384"]


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.utils.profiling import readback

    params = init_pronerf_params(jax.random.PRNGKey(0))
    N, S = 190512, 8
    rng = np.random.default_rng(0)
    qp = jnp.asarray(rng.normal(size=(N, S, 3)), jnp.float32)
    vd = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    zs = jnp.asarray(np.sort(rng.uniform(0.01, 0.99, (N, S)), -1), jnp.float32)
    dn = jnp.asarray(rng.uniform(0.9, 1.5, (N,)), jnp.float32)
    ma = jnp.asarray(rng.normal(size=(N, S)), jnp.float32)

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

    def timed(name, fn, iters=4, reps=3):
        try:
            @jax.jit
            def loop(c):
                def body(c, _):
                    return fn(c), ()
                c, _ = jax.lax.scan(body, c, None, length=iters)
                return c

            readback(loop(jnp.float32(0)))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                readback(loop(jnp.float32(0)))
                ts.append((time.perf_counter() - t0) * 1e3)
            ms = (float(np.median(ts)) - null) / iters
            print(json.dumps({"variant": name, "ms": round(ms, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)

    def run(tag):
        kind, b = tag.split("_b")
        b = int(b)
        if kind == "cur":
            from pronerf_tpu.kernels.fused_nerf import (
                fused_nerf_composite, pack_nerf_params,
            )
        else:
            import importlib.util

            import subprocess

            src = subprocess.run(
                ["git", "show", "987ceff:pronerf_tpu/kernels/fused_nerf.py"],
                capture_output=True, text=True, cwd=str(
                    pathlib.Path(__file__).resolve().parent.parent),
            ).stdout
            p = pathlib.Path("/tmp/fused_r1_bench.py")
            p.write_text(src)
            spec = importlib.util.spec_from_file_location("fused_r1b", p)
            m = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(m)
            fused_nerf_composite, pack_nerf_params = (
                m.fused_nerf_composite, m.pack_nerf_params,
            )

        packed = pack_nerf_params(params["nerf"], jnp.bfloat16)

        def step(c):
            out = fused_nerf_composite(
                packed, qp + c * 1e-30, vd, zs, dn, ma, ma, block_rays=b
            )
            return c + out["rgb"][0, 0] * 1e-9
        timed(tag, step)

    for tag in ARGS:
        run(tag)


if __name__ == "__main__":
    main()
