"""Gather OUTPUT-LAYOUT microbenchmark: can the emitter write [3, P]?

The profile of the windowed full-res frame shows each (tile, view) row
gather writing a [P, 3] s32 output whose minor dim lane-pads 128/3 ~= 43x
(~0.4 GB physical per gather) followed by a relayout copy before the
rays-minor lerp fusions — ~17 ms/frame of pure padding traffic. If
``lax.gather`` with ``offset_dims=(0,)`` can emit the transposed [3, P]
(P on lanes, compact, downstream-native) at similar per-index cost, the
whole epipolar feature path goes transposed end to end.

Usage: python scripts/bench_gather_t.py
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

    from pronerf_tpu.utils.profiling import readback

    W = 1008
    R = 198 * W       # one sub-cliff window
    P = 763904        # one (tile, view)'s points at full res
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

    def vary(ix, c):
        return jnp.where(c < jnp.float32(-1.0), ix ^ 1, ix)

    def timed(name, step, iters=6, reps=3):
        try:
            @jax.jit
            def loop(c):
                def body(c, _):
                    return step(c), ()
                c, _ = jax.lax.scan(body, c, None, length=iters)
                return c

            readback(loop(jnp.float32(0.0)))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                readback(loop(jnp.float32(0.0)))
                ts.append((time.perf_counter() - t0) * 1e3)
            ms = (float(np.median(ts)) - null) / iters
            print(json.dumps({"variant": name, "ms": round(ms, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)

    table = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, size=(R, 3), dtype=np.int64)
        .astype(np.int32))
    idx = jnp.asarray(rng.integers(0, R, size=P, dtype=np.int32))

    # baseline: jnp.take -> [P, 3] + a relayout-forcing transposed consumer
    def step_take(c):
        g = jnp.take(table, vary(idx, c), axis=0)          # [P, 3]
        gt = g.T.astype(jnp.float32)                        # [3, P]
        return c + jnp.sum(gt) * 1e-30
    timed("take_P3_then_T", step_take)

    # take consumed in row-major (no transpose; sum folds away layout)
    def step_take_rm(c):
        g = jnp.take(table, vary(idx, c), axis=0)
        return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
    timed("take_P3_sum", step_take_rm)

    # lax.gather emitting [3, P] directly (offset dim leading)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0,),
        start_index_map=(0,),
    )

    def step_gather_t(c):
        g = jax.lax.gather(
            table.T,  # [3, R]; gather cols? -> use non-transposed below
            vary(idx, c)[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(0,), collapsed_slice_dims=(1,),
                start_index_map=(1,),
            ),
            slice_sizes=(3, 1),
        )  # [3, P]
        return c + jnp.sum(g.astype(jnp.float32)) * 1e-30
    timed("gather_cols_3P_from_3R", step_gather_t)

    def step_gather_t2(c):
        g = jax.lax.gather(
            table,
            vary(idx, c)[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(0,), collapsed_slice_dims=(0,),
                start_index_map=(0,),
            ),
            slice_sizes=(1, 3),
        )  # offset dim (the 3) leading -> [3, P]
        return c + jnp.sum(g.astype(jnp.float32)) * 1e-30
    timed("gather_rows_out3P", step_gather_t2)

    # the 3-planar 1-D gathers (known-bad control, transposed-native)
    planes = [jnp.asarray(np.ascontiguousarray(np.asarray(table)[:, j]))
              for j in range(3)]

    def step_planar(c):
        iv = vary(idx, c)
        g = jnp.stack([jnp.take(p, iv) for p in planes], axis=0)  # [3, P]
        return c + jnp.sum(g.astype(jnp.float32)) * 1e-30
    timed("planar_3x1d", step_planar)


if __name__ == "__main__":
    main()
