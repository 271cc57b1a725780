"""Epipolar-fetch variants at serving shapes: one compacted view table,
idx [N, 8] (epipolar-coherent), x4 views implied. Finds the cheapest
formulation of the u8 corner fetch.

Variants:
  row3       take(table [HW,3], idx [N,8]) -> [N,8,3]      (current)
  planar3    3x take(word_j [HW], idx [N,8]) -> [N,8] each
  corner4    4x take(word [HW], idx_c [N,8]) -> [N,8] each (rgb-word table;
             bilinear via 4 whole-pixel words instead of corner-stack rows)
  row3x4     row3 but all four views in one call (shared idx math)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ARGS = sys.argv[1:] or ["row3", "planar3", "corner4"]


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.utils.profiling import readback

    H, W = 378, 504
    N, S = 190512, 8
    HW = H * W
    rng = np.random.default_rng(0)

    # epipolar-coherent indices: smooth per-pixel flow + per-sample offset
    base = np.arange(N) % HW
    off = (rng.uniform(-40, 40, (N, S)) + 8 * np.arange(S)).astype(np.int64)
    idx = np.clip(base[:, None] + off, 0, HW - 1).astype(np.int32)
    idx_j = jnp.asarray(idx)

    table_rows = jnp.asarray(
        rng.integers(0, 2**31 - 1, (HW, 3), dtype=np.int64), jnp.int32
    )
    word = table_rows[:, 0]

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
            readback(fn(jnp.int32(0)))
            ts = []
            for i in range(reps):
                t0 = time.perf_counter()
                readback(fn(jnp.int32(i % 2)))
                ts.append((time.perf_counter() - t0) * 1e3)
            ms = float(np.median(ts)) - null
            print(json.dumps({"variant": name, "ms": round(ms, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)

    # each variant ends in a cheap reduction to force materialization
    def run(tag):
        if tag == "row3":
            @jax.jit
            def f(c):
                rows = jnp.take(table_rows, idx_j + c, axis=0)  # [N,8,3]
                return (rows & 0xFF).sum()
            timed(tag, f)
        elif tag == "planar3":
            @jax.jit
            def f(c):
                acc = jnp.int32(0)
                for j in range(3):
                    w = jnp.take(table_rows[:, j], idx_j + c)  # [N,8]
                    acc = acc + (w & 0xFF).sum()
                return acc
            timed(tag, f)
        elif tag == "corner4":
            @jax.jit
            def f(c):
                acc = jnp.int32(0)
                for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    w = jnp.take(
                        word, jnp.minimum(idx_j + c + dy * W + dx, HW - 1)
                    )  # [N,8]
                    acc = acc + (w & 0xFF).sum()
                return acc
            timed(tag, f)
        elif tag == "row3x4":
            @jax.jit
            def f(c):
                acc = jnp.int32(0)
                for v in range(4):
                    rows = jnp.take(
                        table_rows, jnp.minimum(idx_j + c + v, HW - 1), axis=0
                    )
                    acc = acc + (rows & 0xFF).sum()
                return acc
            timed(tag, f)

    for tag in ARGS:
        run(tag)


if __name__ == "__main__":
    main()
