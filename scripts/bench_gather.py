"""Microbenchmark: XLA TPU gather cost model at the epipolar-fetch shapes.

The inference frame performs ~6.1M row gathers (190512 rays x 4 views x 8
samples) from a [17*378*504, 3]-int32 packed corner-stack table — the
dominant cost of the headline bench (~40 of 69 ms in round 1). This script
measures how gather cost scales with row width, element dtype, table
layout, index order, and bounds-check mode, to pick the fastest layout that
still yields exact bilinear parity (12 corner bytes per point).

Run on the real TPU: `python scripts/bench_gather.py` (axon env). Prints one
JSON line per variant, flushed incrementally.
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

    dev = jax.devices()[0]
    print(json.dumps({"device_kind": dev.device_kind,
                      "platform": dev.platform}), flush=True)

    T, H, W = 17, 378, 504
    R = T * H * W                      # 3.24M table rows
    P = (H * W) * 4 * 8                # 6.1M gathered points

    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, R, size=P, dtype=np.int32)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np))

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

    def timed(name, make_fn, iters=4, reps=3):
        """make_fn() -> (step, init_carry); step: carry -> carry."""
        try:
            step, c0 = make_fn()

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
            print(json.dumps({"variant": name,
                              "error": str(e)[:200]}), flush=True)
            return None

    # Perturb indices from the carry so the scan can't hoist the gather.
    # `c & 0` constant-folds (measured: hoisted, ~0 ms); a data-dependent
    # where() against a runtime predicate does not. One elementwise pass
    # over the 6.1M indices ~ 0.1 ms at HBM speed.
    def vary(ix, c):
        pred = c < jnp.float32(-1.0)  # always False, unknowable at compile
        return jnp.where(pred, ix ^ 1, ix)

    def rows_i32(width, use_idx=None, mode=None, name=None):
        table = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(R, width), dtype=np.int64)
            .astype(np.int32)
        ) if width > 1 else jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(R,), dtype=np.int64)
            .astype(np.int32)
        )
        ix = idx if use_idx is None else use_idx

        def make():
            def step(c):
                g = jnp.take(table, vary(ix, c), axis=0, **(
                    {"mode": mode} if mode else {}))
                s = jnp.sum(g, dtype=jnp.int32).astype(jnp.float32)
                return c + s * 1e-30
            return step, jnp.float32(0.0)
        return make

    # 1. current layout: [R, 3] int32 rows
    timed("rows3_i32", rows_i32(3))
    # 2. one word per point (the nearest-path cost)
    timed("word1_i32", rows_i32(1))
    # 3/4. wider rows: per-row vs per-element cost model
    timed("rows8_i32", rows_i32(8))
    timed("rows16_i32", rows_i32(16))
    # 5. bounds-check mode
    timed("rows3_i32_inbounds", rows_i32(3, mode="promise_in_bounds"))
    # 6. sorted indices (locality)
    timed("rows3_i32_sorted", rows_i32(3, use_idx=idx_sorted))
    # 7. f32 12-channel (round-1 pre-u8 layout, calibration)
    def f32x12():
        table = jnp.asarray(rng.random((R, 12), dtype=np.float32))
        def step(c):
            g = jnp.take(table, vary(idx, c), axis=0)
            return c + jnp.sum(g) * 1e-30
        return step, jnp.float32(0.0)
    timed("rows12_f32", f32x12)

    # 8. three separate 1-word gathers (same bytes as rows3, 3x instructions)
    def three_words():
        tables = [jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(R,), dtype=np.int64)
            .astype(np.int32)) for _ in range(3)]
        def step(c):
            ix = vary(idx, c)
            s = sum(jnp.sum(jnp.take(t, ix), dtype=jnp.int32)
                    for t in tables).astype(jnp.float32)
            return c + s * 1e-30
        return step, jnp.float32(0.0)
    timed("3x_word1_i32", three_words)

    # 9. minor-dim gather: table [3, R], take along axis=1
    def minor_dim():
        table = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(3, R), dtype=np.int64)
            .astype(np.int32))
        def step(c):
            g = jnp.take(table, vary(idx, c), axis=1)
            return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
        return step, jnp.float32(0.0)
    timed("minor3_i32", minor_dim)

    # 10. int8 table [R, 12] (same bytes as rows3)
    def i8x12():
        table = jnp.asarray(
            rng.integers(-128, 127, size=(R, 12), dtype=np.int64)
            .astype(np.int8))
        def step(c):
            g = jnp.take(table, vary(idx, c), axis=0)
            return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
        return step, jnp.float32(0.0)
    timed("rows12_i8", i8x12)

    # 11. bf16 table [R, 8] (16-bit elements)
    def bf16x8():
        table = jnp.asarray(rng.random((R, 8), dtype=np.float32)).astype(
            jnp.bfloat16)
        def step(c):
            g = jnp.take(table, vary(idx, c), axis=0)
            return c + jnp.sum(g.astype(jnp.float32)) * 1e-30
        return step, jnp.float32(0.0)
    timed("rows8_bf16", bf16x8)

    # 12. linearity check: quarter point count
    def quarter():
        table = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(R, 3), dtype=np.int64)
            .astype(np.int32))
        ix = idx[: P // 4]
        def step(c):
            g = jnp.take(table, vary(ix, c), axis=0)
            return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
        return step, jnp.float32(0.0)
    timed("rows3_i32_quarterN", quarter)

    # 13. small table (1 view instead of 17): does table size matter?
    def small_table():
        Rs = H * W
        table = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(Rs, 3), dtype=np.int64)
            .astype(np.int32))
        ix = jnp.asarray(rng.integers(0, Rs, size=P, dtype=np.int32))
        def step(c):
            g = jnp.take(table, vary(ix, c), axis=0)
            return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
        return step, jnp.float32(0.0)
    timed("rows3_i32_smalltable", small_table)

    # 14. dynamic_slice comparison: contiguous reads of the same byte volume
    def dense_pass():
        table = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(P, 3), dtype=np.int64)
            .astype(np.int32))
        def step(c):
            return c + jnp.sum(
                table + c.astype(jnp.int32), dtype=jnp.int32
            ).astype(jnp.float32) * 1e-30
        return step, jnp.float32(0.0)
    timed("dense_elementwise_same_bytes", dense_pass)


if __name__ == "__main__":
    main()
