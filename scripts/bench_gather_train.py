"""Training-path epipolar gather A/B at fern scale (17 views @ 504x378).

Round-3 finding: the fern-scale train step costs ~43 ms marginal vs 8.4 ms
on the small synthetic scene, attributed to the per-ray randomized warp
gathering from the 38.9 MB all-views u8 table (above the ~2.3 MB gather
staging cliff; row-band windows don't apply to per-ray view sets). The
candidate fix (``ops/warp.py:epipolar_colors_per_view``) loops the T
training views, gathers each view's [N, S] points from its own 2.29 MB
sub-cliff table, and mask-selects into the per-ray neighbor slots.

This probe times the ISOLATED warp both ways at the training operating
point (N_rand=4096 rays x 4 views x 8 samples), plus the raw gathers with
the same index counts, so the winner (and the auto default, Config
``train_gather=-1``) is set by measurement.

Usage: python scripts/bench_gather_train.py  (TPU; ~1 min)
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

    from pronerf_tpu.ops.warp import (
        build_corner_stack_u8,
        epipolar_colors,
        epipolar_colors_per_view,
        fuse_projection,
    )
    from pronerf_tpu.utils.profiling import readback

    T, H, W = 17, 378, 504
    N, V, S = 4096, 4, 8
    rng = np.random.default_rng(0)

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

    def timed(name, step, c0=jnp.float32(0.0), iters=8, reps=3):
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
            return ms
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            return None

    images = rng.random((T, H, W, 3)).astype(np.float32)
    packed = build_corner_stack_u8(jnp.asarray(images))
    poses = np.stack([np.eye(3, 4, dtype=np.float32) for _ in range(T)])
    poses[:, :3, 3] = rng.normal(0, 0.3, (T, 3))
    K = jnp.asarray(
        np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]],
                 np.float32))
    M = fuse_projection(jnp.asarray(poses))
    ro = jnp.asarray(rng.normal(0, 0.2, (N, 3)).astype(np.float32))
    rd_np = rng.normal(0, 1, (N, 3)).astype(np.float32)
    rd_np[:, 2] = -np.abs(rd_np[:, 2]) - 0.5
    rd = jnp.asarray(rd_np)
    z0 = jnp.asarray(
        np.sort(rng.uniform(1.0, 6.0, (N, S)).astype(np.float32), -1))
    view_idx = jnp.asarray(rng.integers(0, T, size=(N, V)).astype(np.int32))

    # vary depths per iteration so the scan body can't be CSE'd
    def warp_step(fn):
        def step(c):
            z = z0 + c * 1e-6
            cols = fn(packed, M, K, view_idx, ro, rd, z)
            return c + jnp.sum(cols) * 1e-12
        return step

    timed("warp_allviews_38.9MB", warp_step(epipolar_colors))
    timed("warp_per_view_17x2.29MB", warp_step(epipolar_colors_per_view))
    timed("warp_allviews_split3", warp_step(
        lambda *a: epipolar_colors(*a, split=True)))
    timed("warp_per_view_split3", warp_step(
        lambda *a: epipolar_colors_per_view(*a, split=True)))

    # raw gathers at matched index counts, to separate gather cost from
    # the projection/select overhead
    flat = packed.reshape(T * H * W, 3)
    idx_big = jnp.asarray(
        rng.integers(0, T * H * W, size=N * V * S, dtype=np.int32))

    def step_big(c):
        ix = jnp.where(c < -1.0, idx_big ^ 1, idx_big)
        g = jnp.take(flat, ix, axis=0)
        return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
    timed(f"raw_gather_38.9MB_{N*V*S}idx", step_big)

    one = flat[: H * W]
    idx_small = jnp.asarray(
        rng.integers(0, H * W, size=N * S, dtype=np.int32))

    def step_small(c):
        ix = jnp.where(c < -1.0, idx_small ^ 1, idx_small)
        out = c
        for _ in range(T):
            g = jnp.take(one, ix, axis=0)
            out = out + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
        return out
    timed(f"raw_gather_17x2.29MB_{N*S}idx_each", step_small)


if __name__ == "__main__":
    main()
