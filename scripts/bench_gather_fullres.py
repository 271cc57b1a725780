"""Full-resolution (1008x756) gather-cliff microbenchmark.

Round-2 finding (tpu-perf-facts-v5e): row gathers from tables <= ~2.3 MB
run ~2.5x faster per index; the full-res packed view (9.1 MB) falls off
the cliff and halves frame throughput. This probe measures, at the full-
res operating point (6.1 M points/view):

1. the per-view gather at full table size (the current cost);
2. WINDOWED gathers: dynamic_slice a band of rows to a sub-cliff table,
   then gather (the candidate fix — epipolar locality keeps a target
   row-tile's projections inside a band);
3. the cliff location: band-height sweep;
4. index coherence: epipolar indices are spatially smooth in target-row
   order — does the emitter care? (random vs coherent index streams);
5. row width 3 vs 4 (alignment) at the full table.

Usage: python scripts/bench_gather_fullres.py
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

    H, W = 756, 1008
    P = H * W * 8  # 6.1M points for ONE view
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

    def timed(name, step, c0=None, iters=4, reps=3):
        c0 = jnp.float32(0.0) if c0 is None else c0
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

    table = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, size=(H * W, 3), dtype=np.int64)
        .astype(np.int32))
    idx_rand = jnp.asarray(rng.integers(0, H * W, size=P, dtype=np.int32))

    # coherent indices: target-row-major order, projections drift smoothly
    base = np.linspace(0, H * W - 1, P)
    idx_coh = jnp.asarray(
        np.clip(base + rng.integers(-W, W, size=P), 0, H * W - 1)
        .astype(np.int32))

    # 1/4. full table, random vs coherent
    def step_rand(c):
        g = jnp.take(table, vary(idx_rand, c), axis=0)
        return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
    timed("full9.1MB_rand", step_rand)

    def step_coh(c):
        g = jnp.take(table, vary(idx_coh, c), axis=0)
        return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
    timed("full9.1MB_coherent", step_coh)

    # 3. band-height sweep: dynamic_slice a [bh, W, 3] window, then gather
    table3 = table.reshape(H, W, 3)
    for bh in (96, 128, 190, 256, 378, 512):
        mb = bh * W * 12 / 1e6
        R = bh * W
        idx_b = jnp.asarray(rng.integers(0, R, size=P, dtype=np.int32))

        def step_band(c, bh=bh, R=R, idx_b=idx_b):
            start = jnp.int32(17) + jnp.int32(c < -1.0)
            win = jax.lax.dynamic_slice(
                table3, (start, 0, 0), (bh, W, 3)
            ).reshape(R, 3)
            g = jnp.take(win, vary(idx_b, c), axis=0)
            return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
        timed(f"band{bh}rows_{mb:.2f}MB", step_band)

    # banded whole-frame emulation: 8 target tiles x (window + gather P/8)
    for bh in (190, 256):
        R = bh * W
        idxs = [jnp.asarray(rng.integers(0, R, size=P // 8, dtype=np.int32))
                for _ in range(8)]

        def step_tiles(c, bh=bh, R=R, idxs=idxs):
            s = jnp.float32(0.0)
            for t in range(8):
                start = jnp.int32(40 * t) + jnp.int32(c < -1.0)
                win = jax.lax.dynamic_slice(
                    table3, (start, 0, 0), (bh, W, 3)
                ).reshape(R, 3)
                g = jnp.take(win, vary(idxs[t], c), axis=0)
                s = s + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32)
            return c + s * 1e-30
        timed(f"8tiles_band{bh}", step_tiles)

    # 5. row width 4 (16-byte aligned rows) at full size
    table4 = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, size=(H * W, 4), dtype=np.int64)
        .astype(np.int32))

    def step_w4(c):
        g = jnp.take(table4, vary(idx_rand, c), axis=0)
        return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
    timed("full12.2MB_rows4", step_w4)

    # single-word (nearest-pack) full-res table: 3.05 MB
    table1 = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, size=(H * W,), dtype=np.int64)
        .astype(np.int32))

    def step_w1(c):
        g = jnp.take(table1, vary(idx_rand, c))
        return c + jnp.sum(g, dtype=jnp.int32).astype(jnp.float32) * 1e-30
    timed("full3.05MB_rows1", step_w1)


if __name__ == "__main__":
    main()
