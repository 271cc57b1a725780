"""Split-word epipolar gather probe (full-res serving path).

The serving warp's per-point gather returns int32 rows of width 3
(``bilinear_sample_packed_u8``: one [P, 3] take per view). On v5e a
rank-2 [P, 3] array tiles with only 3 of 128 lanes used, and DESIGN.md
records ~17 ms/frame of [P, 3] relayout copies at 1008x756 as "the price
of the fast gather" (the transposed [3, P] emission measured slower
because the emitter's fast path only fires for take-style row gathers).

Hypothesis: THREE 1-D takes from per-word tables (word k = channel k's
packed corners) keep the fast take-style form AND emit rank-1 [P]
results that are fully lane-packed — no relayout. Extra cost: 3x index
processing. This probe times, at the full-res shared-view operating
point (N = 1008*756 rays x S=8, per view):

  - raw row gather  take([M, 3], idx)            (current form)
  - raw split       3 x take([M], idx)           (candidate)
  - end-to-end shared 4-view warp, both samplers

Usage: python scripts/bench_gather_split.py  (TPU, ~3 min)
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
        epipolar_colors_shared,
        fuse_projection,
    )
    from pronerf_tpu.utils.profiling import readback

    T, H, W = 17, 756, 1008
    S, V = 8, 4
    N = H * W
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

    def timed(name, step, c0=jnp.float32(0.0), iters=6, reps=3):
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

    # ---- raw gathers: one view-table, P = N*S indices --------------------
    P = N * S
    flat3 = jnp.asarray(
        rng.integers(0, 2**31 - 1, size=(H * W, 3), dtype=np.int64)
        .astype(np.int32))
    words = [flat3[:, k] for k in range(3)]
    idx = jnp.asarray(rng.integers(0, H * W, size=P, dtype=np.int64)
                      .astype(np.int32))

    def step_row(c):
        ix = jnp.where(c < -1.0, idx ^ 1, idx)
        g = jnp.take(flat3, ix, axis=0)
        return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30

    def step_split(c):
        ix = jnp.where(c < -1.0, idx ^ 1, idx)
        out = c
        for k in range(3):
            g = jnp.take(words[k], ix)
            out = out + jnp.sum(g, dtype=jnp.int32).astype(
                jnp.float32) * 1e-30
        return out

    timed(f"raw_row_gather_[{P}]x3w", step_row)
    timed(f"raw_split_gather_3x[{P}]", step_split)

    # ---- end-to-end shared 4-view warp ----------------------------------
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
    view_ids = jnp.arange(V, dtype=jnp.int32)

    def warp_step(fn):
        def step(c):
            z = z0 + c * 1e-6
            cols = fn(packed, M, K, view_ids, ro, rd, z)
            return c + jnp.sum(cols) * 1e-12
        return step

    timed("warp_shared_rowgather", warp_step(epipolar_colors_shared))
    timed("warp_shared_split3", warp_step(
        lambda *a: epipolar_colors_shared(*a, split=True)))

    # windowed (the actual full-res serving path) both ways, at the auto
    # statics the renderer resolves for this geometry
    import dataclasses

    from pronerf_tpu.models.pronerf import RenderStatics
    from pronerf_tpu.ops.warp import epipolar_colors_shared_windowed
    from pronerf_tpu.render.renderer import resolve_gather_statics

    auto = resolve_gather_statics(
        dataclasses.replace(RenderStatics(), gather_tiles=-1), H, W, N)
    nt, wr = auto.gather_tiles, auto.gather_window_rows
    print(json.dumps({"auto_tiles": nt, "auto_window_rows": wr}), flush=True)
    timed(f"warp_windowed_row_t{nt}_wr{wr}", warp_step(
        lambda *a: epipolar_colors_shared_windowed(*a, nt, wr)))
    timed(f"warp_windowed_split_t{nt}_wr{wr}", warp_step(
        lambda *a: epipolar_colors_shared_windowed(*a, nt, wr, split=True)))

    # equality check on device (arrays are ~300 MB; never read back)
    @jax.jit
    def maxdiff(z):
        a = epipolar_colors_shared(packed, M, K, view_ids, ro, rd, z)
        b = epipolar_colors_shared(packed, M, K, view_ids, ro, rd, z,
                                   split=True)
        return jnp.abs(a - b).max()
    print(json.dumps({"max_abs_diff": float(maxdiff(z0))}), flush=True)


if __name__ == "__main__":
    main()
