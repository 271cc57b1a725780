"""Follow-up gather microbenchmark: table-size cliff + view compaction.

bench_gather.py found the fetch cost is ~per-row AND collapses ~3x when the
table is small (1 view, 2.3 MB vs 17 views, 39 MB). At inference only the 4
selected neighbor views are gathered, so the table can be compacted to
9.1 MB per frame. This script locates the size cliff and times the
compaction step itself.
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

    H, W = 378, 504
    P = (H * W) * 4 * 8  # 6.1M points
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
        pred = c < jnp.float32(-1.0)
        return jnp.where(pred, ix ^ 1, ix)

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
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)

    # Table-size sweep at constant point count (6.1M), rows of 3 int32.
    for views in (1, 2, 4, 6, 8, 12):
        R = views * H * W
        table = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(R, 3), dtype=np.int64)
            .astype(np.int32))
        idx = jnp.asarray(rng.integers(0, R, size=P, dtype=np.int32))

        def step(c, table=table, idx=idx):
            g = jnp.take(table, vary(idx, c), axis=0)
            return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
        timed(f"rows3_views{views}", step, jnp.float32(0.0))

    # 4-view table, row width sweep.
    R4 = 4 * H * W
    idx4 = jnp.asarray(rng.integers(0, R4, size=P, dtype=np.int32))
    for width in (3, 4, 8):
        table = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(R4, width), dtype=np.int64)
            .astype(np.int32))

        def step(c, table=table):
            g = jnp.take(table, vary(idx4, c), axis=0)
            return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
        timed(f"rows{width}_views4", step, jnp.float32(0.0))

    # Per-view split: 4 gathers of 1.5M points each from 1-view tables.
    tables = [jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, size=(H * W, 3), dtype=np.int64)
        .astype(np.int32)) for _ in range(4)]
    idx1s = [jnp.asarray(
        rng.integers(0, H * W, size=P // 4, dtype=np.int32))
        for _ in range(4)]

    def step_split(c):
        s = jnp.float32(0.0)
        for t, ix in zip(tables, idx1s):
            g = jnp.take(t, vary(ix, c), axis=0)
            s = s + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32)
        return c + s * 1e-30
    timed("split_4x_1view", step_split, jnp.float32(0.0))

    # The compaction step itself: slice 4 dynamic views out of a 17-view
    # packed stack (what the renderer would do once per frame).
    T = 17
    big = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, size=(T, H * W, 3), dtype=np.int64)
        .astype(np.int32))
    sel = jnp.asarray([3, 7, 11, 16], jnp.int32)

    def step_compact(c):
        s = vary(sel, c)
        small = jnp.take(big, s, axis=0)  # [4, HW, 3]
        return c + jnp.sum(small, dtype=jnp.int32).astype(jnp.float32) * 1e-30
    timed("compact_take4_of17", step_compact, jnp.float32(0.0))

    def step_compact_ds(c):
        s = vary(sel, c)
        parts = [
            jax.lax.dynamic_slice_in_dim(big, s[i], 1, axis=0)
            for i in range(4)
        ]
        small = jnp.concatenate(parts, axis=0)
        return c + jnp.sum(small, dtype=jnp.int32).astype(jnp.float32) * 1e-30
    timed("compact_4x_dynamic_slice", step_compact_ds, jnp.float32(0.0))

    # End-to-end: compact THEN gather 6.1M from the compacted table.
    def step_full(c):
        s = vary(sel, c)
        small = jnp.take(big, s, axis=0).reshape(R4, 3)
        g = jnp.take(small, idx4, axis=0)
        return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
    timed("compact_then_gather", step_full, jnp.float32(0.0))


if __name__ == "__main__":
    main()
