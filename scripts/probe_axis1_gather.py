"""Probe: can the epipolar gather be BORN lane-packed?

Round-4 finding (results/probes_r4_t_emit.txt + profile): expressing the
transpose downstream does not help — the gather fusion still writes
[P, 3] s32 in a T(8,128) layout with 3/128 lanes used (~42x padded), and
XLA still inserts the ~0.78 ms/(tile,view) relayout copy. The only way to
kill both is for the take's RESULT to be lane-packed at birth.

Variant under test: pre-transpose the window table to [3, rows] (host- or
slice-time) and ``jnp.take(win_t, idx, axis=1)`` -> [3, P] with rays on
lanes. If the emitter runs axis-1 takes at the row-take element rate,
the per-(tile,view) cost drops from ~1.8 ms (gather + copy) toward
~1.0 ms and the 1008x756 frame saves ~25 ms.

Variants (one (tile, view) block: wr=198 source rows, nt=95256 rays, S=8):
  base      : [rows, 3] axis-0 row take + lerp + transposed finish
              (= the shipped t_emit form; r4 probe said 0.89, in-frame 1.8)
  base_take : the axis-0 take alone
  axis1     : [3, rows] axis-1 take -> [3, S, nt] lerp -> [3*S, nt] finish
  axis1_take: the axis-1 take alone
  axis1_u8  : axis-1 take from a [12, rows] u8-bitcast table (lane-packed
              AND no shift/mask unpack; 4x the index elements)

Usage: python scripts/probe_axis1_gather.py [--cpu]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CPU = "--cpu" in sys.argv


def timed_scan(jax, body, init, iters, null, reps=3):
    import jax.numpy as jnp  # noqa: F401

    @jax.jit
    def loop(c):
        def step(c, _):
            return body(c), ()

        c, _ = jax.lax.scan(step, c, None, length=iters)
        return c

    from pronerf_tpu.utils.profiling import readback

    readback(loop(init))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(loop(init))
        ts.append((time.perf_counter() - t0) * 1e3)
    return (float(np.median(ts)) - null) / iters


def main():
    import jax

    if CPU:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if not CPU:
        from pronerf_tpu.cli import enable_compilation_cache

        enable_compilation_cache()
    from pronerf_tpu.utils.profiling import null_dispatch_ms

    null = 0.0 if CPU else null_dispatch_ms()
    print(json.dumps({"dispatch_null_ms": round(null, 2), "cpu": CPU}),
          flush=True)

    if CPU:
        wr, W, nt, S = 16, 64, 512, 8
    else:
        wr, W, nt, S = 198, 1008, 95256, 8
    rows = wr * W
    key = jax.random.PRNGKey(7)

    @jax.jit
    def make_inputs(key):
        k1, k3, k4 = jax.random.split(key, 3)
        win_u32 = jax.random.randint(
            k1, (rows, 3), 0, np.int32(2**31 - 1), jnp.int32
        )
        # transposed-layout index/weight panels [S, nt] (lane-packed)
        y0 = jax.random.randint(k3, (S, nt), 0, wr - 1, jnp.int32)
        x0 = jax.random.randint(k3, (S, nt), 0, W - 1, jnp.int32)
        wx = jax.random.uniform(k4, (S, nt), jnp.float32)
        wy = jax.random.uniform(k4, (S, nt), jnp.float32)
        return win_u32, y0, x0, wx, wy

    win_u32, y0, x0, wx, wy = jax.block_until_ready(make_inputs(key))
    idx_t = y0 * W + x0                       # [S, nt]
    idx_r = idx_t.T                           # [nt, S] row-major twin
    win_t = win_u32.T                         # [3, rows]
    win_u8t = jax.lax.bitcast_convert_type(
        win_u32, jnp.uint8
    ).reshape(rows, 12).T                     # [12, rows]
    win_t, win_u8t, idx_r = jax.block_until_ready((win_t, win_u8t, idx_r))

    def lane(w, shift):
        return ((w >> shift) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)

    def lerp(c00, c01, c10, c11, wx_, wy_):
        top = c00 * (1.0 - wx_) + c01 * wx_
        bot = c10 * (1.0 - wx_) + c11 * wx_
        return top * (1.0 - wy_) + bot * wy_

    def v_base(idx):  # idx [nt, S]
        rows_w = jnp.take(win_u32, idx, axis=0).astype(jnp.uint32)
        wxr, wyr = wx.T[..., None], wy.T[..., None]
        out = lerp(lane(rows_w, 0), lane(rows_w, 8), lane(rows_w, 16),
                   lane(rows_w, 24), wxr, wyr)
        return out.reshape(nt, S * 3).T.astype(jnp.bfloat16)

    def v_base_take(idx):
        rows_w = jnp.take(win_u32, idx, axis=0)
        return rows_w.reshape(nt, S * 3).T

    def v_axis1(idx):  # idx [S, nt]
        w = jnp.take(win_t, idx.reshape(-1), axis=1).astype(jnp.uint32)
        w = w.reshape(3, S, nt)
        out = lerp(lane(w, 0), lane(w, 8), lane(w, 16), lane(w, 24),
                   wx[None], wy[None])       # [3, S, nt]
        return out.reshape(3 * S, nt).astype(jnp.bfloat16)  # (c, s) rows

    def v_axis1_take(idx):
        w = jnp.take(win_t, idx.reshape(-1), axis=1)
        return w.reshape(3 * S, nt)

    def v_axis1_u8(idx):  # idx [S, nt]
        b = jnp.take(win_u8t, idx.reshape(-1), axis=1)
        b = b.reshape(3, 4, S, nt).astype(jnp.float32) * (1.0 / 255.0)
        out = lerp(b[:, 0], b[:, 1], b[:, 2], b[:, 3], wx[None], wy[None])
        return out.reshape(3 * S, nt).astype(jnp.bfloat16)

    # correctness: axis1 == base modulo the (s,c)->(c,s) row permutation
    ref = np.asarray(v_base(idx_r), np.float32).reshape(S, 3, nt)
    got1 = np.asarray(v_axis1(idx_t), np.float32).reshape(3, S, nt)
    got8 = np.asarray(v_axis1_u8(idx_t), np.float32).reshape(3, S, nt)
    ok1 = bool(np.array_equal(ref.transpose(1, 0, 2), got1))
    ok8 = bool(np.array_equal(ref.transpose(1, 0, 2), got8))
    print(json.dumps({"check": "axis1==base", "ok": ok1}), flush=True)
    print(json.dumps({"check": "axis1_u8==base", "ok": ok8}), flush=True)
    if CPU:
        return

    cases = [
        ("base", v_base, idx_r, (S * 3, nt)),
        ("base_take", v_base_take, idx_r, (S * 3, nt)),
        ("axis1", v_axis1, idx_t, (3 * S, nt)),
        ("axis1_take", v_axis1_take, idx_t, (3 * S, nt)),
        ("axis1_u8", v_axis1_u8, idx_t, (3 * S, nt)),
    ]
    iters = 8
    for name, fn, idx0, oshape in cases:
        odt = (jnp.int32 if name.endswith("take") else jnp.bfloat16)
        buf0 = jnp.zeros(oshape, odt)

        def body(carry, fn=fn, idx0=idx0):
            c_scal, buf = carry
            d = c_scal.astype(jnp.int32) & 1
            out = fn(jnp.clip(idx0 + d, 0, rows - 1))
            return (
                c_scal + out[0, 0].astype(jnp.float32) * 1e-6 + 1.0,
                out + buf * 0,
            )

        try:
            ms = timed_scan(jax, body, (jnp.float32(0.0), buf0), iters, null)
            print(json.dumps({
                "variant": name, "ms_per_tile_view": round(ms, 4),
                "ms_frame_32x": round(32 * ms, 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
    print("EXIT:0", flush=True)


if __name__ == "__main__":
    main()
