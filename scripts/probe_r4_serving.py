"""Round-4 serving probes: gather packing variants + int8 MXU diagnosis.

Two measured facts direct this probe (results/probes_r3/):
1. The full-res windowed epipolar gather materializes [P, 3] u32 words per
   (tile, view); on v5e that array tiles T(8,128) with 3 of 128 lanes used,
   so the gather's write AND the N-minor relayout copy each move ~42x the
   useful bytes (32 x ~1.5 ms/frame = the 'copy' + most of the non-MXU
   'fusion' budget at 1008x756).
2. The int8 fused NeRF kernel measured SLOWER than bf16 standalone
   (12.23 vs 11.31 ms at N=190512) despite the v5e MXU's nominal 2x int8
   rate — unexplained; the whole-frame A/B died on a tunnel payload limit.

Probes (all inputs generated ON DEVICE — the r3 int8 probe's HTTP 413 came
from shipping ~70 MB host arrays through the remote-compile tunnel):

  gather : one (tile, view) windowed gather, variants ending in the
           kernel-consumable transposed bf16 [S*3, nt] form (relayout cost
           included via a transposed scan carry):
             u32x3   — current: [P,3] i32 row take + lerp
             u8x12   — same bytes as u8 [rows,12] take (4x less lane-pad)
             u16x6   — u16 [rows,6] take
             near1   — nearest-word u32 [rows] RANK-1 take (dense, no pad)
             bilin4  — bilinear from 4 rank-1 CONTIGUOUS word takes
                       (vs gather_split's measured-slow strided takes)
  mxu    : pallas chains of 8 256x256 matmuls on [256,4096] blocks:
             bf16+relu / int8+full requant (fused_nerf_q style) /
             int8+minimal int-only band / int8+bf16-arith requant
           — attributes the int8 kernel's loss to MXU rate vs requant VPU.
  kernel : fused_nerf_raw_t vs fused_nerf_raw_tq at BOTH operating points
           (190512 and 762048 rays) — the A/B the r3 probe never finished.

Usage: python scripts/probe_r4_serving.py [gather|mxu|kernel|all] [--cpu]
  --cpu: tiny shapes + interpret=True pallas, correctness only (run FIRST:
  a Mosaic compile crash wedges the remote helper for hours).
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CPU = "--cpu" in sys.argv
ITERS = 8
if "--iters" in sys.argv:
    ITERS = int(sys.argv[sys.argv.index("--iters") + 1])
ARGS = [a for a in sys.argv[1:]
        if not a.startswith("--") and not a.isdigit()] or ["all"]


def _setup():
    import jax

    if CPU:
        jax.config.update("jax_platforms", "cpu")
    return jax


def timed_scan(jax, body, init, iters, null, reps=3):
    """Per-iteration ms of carry->carry body amortized in one scan."""
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


# ---------------------------------------------------------------- gather

def probe_gather(jax, null):
    import jax.numpy as jnp

    if CPU:
        wr, W, nt, S = 16, 64, 512, 8
    else:
        wr, W, nt, S = 198, 1008, 95256, 8
    rows = wr * W
    key = jax.random.PRNGKey(7)

    @jax.jit
    def make_inputs(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # corner-stack words: 4 u8 lanes per word, 3 words/pixel
        win_u32 = jax.random.randint(
            k1, (rows, 3), 0, np.int32(2**31 - 1), jnp.int32
        )
        # whole-pixel RGB word table (nearest / bilin4 form)
        word_tab = jax.random.randint(
            k2, (rows,), 0, np.int32(2**31 - 1), jnp.int32
        )
        # bilinear-local coords: y in [0, wr-2), x in [0, W-2)
        y0 = jax.random.randint(k3, (nt, S), 0, wr - 1, jnp.int32)
        x0 = jax.random.randint(k3, (nt, S), 0, W - 1, jnp.int32)
        wx = jax.random.uniform(k4, (nt, S), jnp.float32)
        wy = jax.random.uniform(k4, (nt, S), jnp.float32)
        return win_u32, word_tab, y0, x0, wx, wy

    win_u32, word_tab, y0, x0, wx, wy = jax.block_until_ready(
        make_inputs(key)
    )
    idx = y0 * W + x0  # [nt, S] row indices
    bcast = jax.lax.bitcast_convert_type
    win_u8 = bcast(win_u32, jnp.uint8).reshape(rows, 12)
    win_u16 = bcast(win_u32, jnp.uint16).reshape(rows, 6)

    def finish(colors):
        # [nt, S, 3] -> kernel-consumable transposed bf16 [S*3, nt]
        return (
            colors.reshape(nt, S * 3).T.astype(jnp.bfloat16)
        )

    def lerp(c00, c01, c10, c11):
        top = c00 * (1.0 - wx[..., None]) + c01 * wx[..., None]
        bot = c10 * (1.0 - wx[..., None]) + c11 * wx[..., None]
        return top * (1.0 - wy[..., None]) + bot * wy[..., None]

    def v_u32x3(idx):
        rows_w = jnp.take(win_u32, idx, axis=0).astype(jnp.uint32)

        def lane(shift):
            return ((rows_w >> shift) & 0xFF).astype(jnp.float32) * (
                1.0 / 255.0
            )

        return finish(lerp(lane(0), lane(8), lane(16), lane(24)))

    def v_u8x12(idx):
        b = jnp.take(win_u8, idx, axis=0).astype(jnp.float32) * (1.0 / 255.0)
        # [nt, S, 12]: (j, c) at j*4+c -> corner c = b[..., j*4+c]
        c = b.reshape(nt, S, 3, 4)
        return finish(
            lerp(c[..., 0], c[..., 1], c[..., 2], c[..., 3])
        )

    def v_u16x6(idx):
        w = jnp.take(win_u16, idx, axis=0).astype(jnp.uint32)
        c = w.reshape(nt, S, 3, 2)
        lo = (c & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        hi = ((c >> 8) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        return finish(
            lerp(lo[..., 0], hi[..., 0], lo[..., 1], hi[..., 1])
        )

    def v_near1(idx):
        w = jnp.take(word_tab, idx.reshape(-1)).reshape(nt, S)
        w = w.astype(jnp.uint32)
        c = jnp.stack(
            [((w >> s) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
             for s in (0, 8, 16)],
            axis=-1,
        )
        return finish(c)

    def v_bilin4(idx):
        flat = idx.reshape(-1)
        outs = []
        for off in (0, 1, W, W + 1):
            w = jnp.take(word_tab, jnp.clip(flat + off, 0, rows - 1))
            w = w.reshape(nt, S).astype(jnp.uint32)
            outs.append(
                jnp.stack(
                    [((w >> s) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
                     for s in (0, 8, 16)],
                    axis=-1,
                )
            )
        return finish(lerp(*outs))

    variants = [
        ("u32x3", v_u32x3), ("u8x12", v_u8x12), ("u16x6", v_u16x6),
        ("near1", v_near1), ("bilin4", v_bilin4),
    ]

    # correctness: u8x12/u16x6 must reproduce u32x3 bit-for-bit
    ref = np.asarray(v_u32x3(idx), np.float32)
    for name in ("u8x12", "u16x6"):
        fn = dict(variants)[name]
        got = np.asarray(fn(idx), np.float32)
        ok = bool(np.array_equal(ref, got))
        print(json.dumps({"check": name, "matches_u32x3": ok}), flush=True)
    if CPU:
        # bilin4 vs direct formula on the word table
        got = np.asarray(v_bilin4(idx), np.float32)
        tab = np.asarray(word_tab).astype(np.uint32)
        fl = np.asarray(idx).reshape(-1)
        cs = []
        for off in (0, 1, W, W + 1):
            w = tab[np.clip(fl + off, 0, rows - 1)].reshape(nt, S)
            cs.append(
                np.stack(
                    [((w >> s) & 0xFF).astype(np.float32) / 255.0
                     for s in (0, 8, 16)], -1,
                )
            )
        wxn, wyn = np.asarray(wx)[..., None], np.asarray(wy)[..., None]
        top = cs[0] * (1 - wxn) + cs[1] * wxn
        bot = cs[2] * (1 - wxn) + cs[3] * wxn
        want = (top * (1 - wyn) + bot * wyn).reshape(nt, S * 3).T
        ok = bool(
            np.allclose(got, want.astype(np.float32), atol=1e-2)
        )
        print(json.dumps({"check": "bilin4_formula", "ok": ok}), flush=True)
        return

    iters = 8
    for name, fn in variants:
        buf0 = jnp.zeros((S * 3, nt), jnp.bfloat16)

        def body(carry, fn=fn):
            c_scal, buf = carry
            # scalar-perturbed indices defeat cross-iteration CSE
            d = (c_scal.astype(jnp.int32) & 1)
            out = fn(jnp.clip(idx + d, 0, rows - 1))
            return (
                c_scal + out[0, 0].astype(jnp.float32) * 1e-6 + 1.0,
                out + buf * 0,
            )

        try:
            ms = timed_scan(
                jax, body, (jnp.float32(0.0), buf0), iters, null
            )
            print(
                json.dumps(
                    {
                        "variant": name,
                        "ms_per_tile_view": round(ms, 4),
                        "ms_frame_32x": round(32 * ms, 2),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)


# ------------------------------------------------------------------- mxu

def probe_mxu(jax, null):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 512 if CPU else 4096
    NB = 2 if CPU else 47  # ~190512 rays at R=4096
    DEPTH = 8
    key = jax.random.PRNGKey(3)

    @jax.jit
    def mk(key):
        kw, kx = jax.random.split(key)
        w = jax.random.normal(kw, (DEPTH, 256, 256), jnp.float32) * 0.06
        x = jax.random.normal(kx, (256, NB * R), jnp.float32)
        return w, x

    w_f32, x_f32 = jax.block_until_ready(mk(key))
    w_bf16 = w_f32.astype(jnp.bfloat16)
    w_i8 = jnp.clip(jnp.round(w_f32 * 127), -127, 127).astype(jnp.int8)
    A = jnp.full((DEPTH, 256, 1), 0.01, jnp.float32)
    B = jnp.full((DEPTH, 256, 1), 1.0, jnp.float32)
    x_bf16 = x_f32.astype(jnp.bfloat16)
    x_i8 = jnp.clip(jnp.round(x_f32 * 16), -127, 127).astype(jnp.int8)

    def dot(w, x, pt):
        return jax.lax.dot_general(
            w, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=pt,
        )

    def k_bf16(w_ref, x_ref, o_ref):
        h = x_ref[:]
        for i in range(DEPTH):
            h = jnp.maximum(
                dot(w_ref[i], h, jnp.float32), 0.0
            ).astype(jnp.bfloat16)
        o_ref[:] = h

    def k_i8_full(w_ref, a_ref, b_ref, x_ref, o_ref):
        h = x_ref[:]
        for i in range(DEPTH):
            acc = dot(w_ref[i], h, jnp.int32).astype(jnp.float32)
            t = acc * a_ref[i] + b_ref[i]
            h = (
                jnp.clip(jnp.floor(t + 0.5), 0.0, 254.0) - 127.0
            ).astype(jnp.int8)
        o_ref[:] = h

    def k_i8_min(w_ref, x_ref, o_ref):
        h = x_ref[:]
        for i in range(DEPTH):
            acc = dot(w_ref[i], h, jnp.int32)
            h = jnp.clip(acc >> 6, -127, 127).astype(jnp.int8)
        o_ref[:] = h

    def k_i8_bf16rq(w_ref, a_ref, b_ref, x_ref, o_ref):
        h = x_ref[:]
        for i in range(DEPTH):
            acc = dot(w_ref[i], h, jnp.int32).astype(jnp.bfloat16)
            t = acc * a_ref[i].astype(jnp.bfloat16) + b_ref[
                i
            ].astype(jnp.bfloat16)
            h = jnp.clip(
                jnp.floor(t + 0.5), -127.0, 127.0
            ).astype(jnp.int8)
        o_ref[:] = h

    def run(name, kernel, ws, x, out_dtype):
        full = lambda a: pl.BlockSpec(
            a.shape, lambda b: (0,) * a.ndim, memory_space=pltpu.VMEM
        )
        f = pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=[full(w) for w in ws]
            + [pl.BlockSpec((256, R), lambda b: (0, b),
                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, R), lambda b: (0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, NB * R), out_dtype),
            interpret=CPU,
        )
        jf = jax.jit(lambda x: f(*ws, x))
        if CPU:
            out = np.asarray(jf(x))
            print(json.dumps({"mxu": name, "finite":
                              bool(np.isfinite(out.astype(np.float32)).all()
                                   if out_dtype != jnp.int8 else True)}),
                  flush=True)
            return

        def body(c):
            out = jf(x + c.astype(x.dtype))
            return c * 0 + out[0, 0].astype(jnp.float32) * 1e-9

        try:
            ms = timed_scan(jax, body, jnp.float32(0.0), 8, null)
            gflop = 2 * DEPTH * 256 * 256 * NB * R / 1e9
            print(
                json.dumps(
                    {
                        "mxu": name,
                        "ms": round(ms, 3),
                        "tflops": round(gflop / ms, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"mxu": name, "error": str(e)[:200]}),
                  flush=True)

    run("bf16_relu", k_bf16, [w_bf16], x_bf16, jnp.bfloat16)
    run("i8_full_requant", k_i8_full, [w_i8, A, B], x_i8, jnp.int8)
    run("i8_min_requant", k_i8_min, [w_i8], x_i8, jnp.int8)
    run("i8_bf16_requant", k_i8_bf16rq, [w_i8, A, B], x_i8, jnp.int8)


# ---------------------------------------------------------------- kernel

def probe_kernel(jax, null):
    import jax.numpy as jnp

    from pronerf_tpu.kernels.fused_nerf import (
        fused_nerf_raw_t,
        pack_nerf_params,
    )
    from pronerf_tpu.kernels.fused_nerf_q import (
        fused_nerf_raw_tq,
        pack_nerf_params_int8,
    )
    from pronerf_tpu.models import init_pronerf_params

    params = init_pronerf_params(jax.random.PRNGKey(0))
    nerf = params["nerf"]
    packed_b = jax.jit(pack_nerf_params)(nerf)
    packed_q = jax.jit(pack_nerf_params_int8)(nerf)

    sizes = (2048,) if CPU else (190512, 762048)
    for N in sizes:
        @jax.jit
        def mk(key, N=N):
            k1, k2 = jax.random.split(key)
            p24 = jax.random.uniform(
                k1, (24, N), jnp.float32, -1.0, 1.0
            )
            vc = jax.random.normal(k2, (128, N), jnp.float32)
            return p24, vc

        p24, vc = jax.block_until_ready(mk(jax.random.PRNGKey(1)))

        for name, fn in (
            ("bf16", lambda p, v: fused_nerf_raw_t(
                packed_b, p, v, interpret=CPU)),
            ("int8", lambda p, v: fused_nerf_raw_tq(
                packed_q, p, v, interpret=CPU)),
        ):
            if CPU:
                out = np.asarray(fn(p24, vc))
                print(json.dumps({"kernel": name, "N": N, "finite":
                                  bool(np.isfinite(out).all())}),
                      flush=True)
                continue

            def body(c, fn=fn):
                out = fn(p24 + c * 1e-7, vc)
                return c + out[0, 0, 0] * 1e-9

            try:
                ms = timed_scan(jax, body, jnp.float32(0.0), 6, null)
                print(json.dumps({"kernel": name, "N": N,
                                  "ms": round(ms, 3)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"kernel": name, "N": N,
                                  "error": str(e)[:200]}), flush=True)


def main():
    jax = _setup()
    from pronerf_tpu.cli import enable_compilation_cache

    if not CPU:
        enable_compilation_cache()
    from pronerf_tpu.utils.profiling import null_dispatch_ms

    null = 0.0 if CPU else null_dispatch_ms()
    print(json.dumps({"dispatch_null_ms": round(null, 2), "cpu": CPU}),
          flush=True)

    want = set(ARGS)
    if "all" in want or "gather" in want:
        probe_gather(jax, null)
    if "all" in want or "mxu" in want:
        probe_mxu(jax, null)
    if "all" in want or "kernel" in want:
        probe_kernel(jax, null)
    print("EXIT:0", flush=True)


if __name__ == "__main__":
    main()
