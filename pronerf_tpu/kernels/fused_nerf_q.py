"""INT8 variant of the fused PE -> NeRF MLP Pallas kernel (serving only).

Motivation: the bf16 kernel is MXU-bound (~78-82% standalone MFU —
fused_nerf.py), and the v5e MXU's NOMINAL int8 rate is 2x bf16 (394 vs 197
TOPS). MEASURED RESULT (rounds 3-4, results/probes_r3/int8_kernel.txt and
results/probes_r4_serving.txt): this kernel does NOT realize that rate —
int8 runs slightly SLOWER than the bf16 kernel standalone (11.2 vs 10.4 ms
at N=190512; reproduced across sessions) AND in the real serving frame
(results/probes_r4_int8_frame.txt: 138.2 vs 134.0 ms at 1008x756, 31.9 vs
29.0 ms at 504x378), so ``quant = int8`` is a measured NEGATIVE result
kept as a documented A/B knob, not a speed option. See docs/DESIGN.md for the attribution (the inter-layer requant
chain runs on the VPU serially with the MXU; Mosaic's int8 dot does not
deliver a 2x wall-clock win at these shapes). The quantization chain
itself is sound: per-channel calibrated activations hold render quality
(tests/test_fused_nerf_q.py), the positional-encoding consumers (w0/w5 PE
rows, K=63) and sin/cos stay bf16/f32. The reference's analogue is
TensorRT's int8 engine mode (the release builds FP16 engines,
``onnx2trt.py:21-34``); bf16 remains both the parity default and the
faster path.

Scheme (classic integer-only inference, all scales folded at pack time):

- weights: symmetric per-output-channel int8 (``w_q = round(w' / s_w[o])``);
- activations: affine PER-CHANNEL uint8-in-int8 — feature k with calibrated
  range [m_k, m_k + 254 s_k] is carried as ``q = clip(floor((h_k - m_k)/s_k
  + .5), 0, 254) - 127``. Per-channel is load-bearing: trained ProNeRF nets
  have activation outliers spanning 3+ orders of magnitude across channels
  (h6 max ~1e3 vs typical ~1; per-TENSOR scales measured 9.9 dB vs bf16 at
  render level — garbage — where per-channel recovers it). The input
  scale diag(s_in) folds into the next layer's weight COLUMNS before the
  per-row weight quant (``w' = w * s_in[k]``), so the int8 matmul itself
  never sees it;
- each layer computes ``t = acc_i32 * A[o] + B[o]`` where ``A`` folds
  ``s_w / s_out`` and ``B`` folds the bias, the +-127 zero-point correction
  ``127 * s_w * rowsum(w'_q)``, the exact offset term ``w @ m_in``, and the
  output offset — then requantizes with ``clip(floor(t + .5), 0, 254)
  - 127``. The lower clip IS the ReLU for m_out = 0 layers, so the
  quantized chain needs no separate activation op and no scalar plumbing:
  A/B ride along as [out, 1] f32 panels.

Activation ranges come from ``calibrate_nerf_ranges`` — a pure-jnp f32
forward on synthetic points covering the NDC query volume (traceable, so
packing can stay inside the jitted frame; ~8k points = <0.1% of one frame's
NeRF FLOPs, and XLA CSEs it across tiles since it depends only on params).

Layout/grid are identical to ``fused_nerf.fused_nerf_raw_t`` (transposed,
rays on lanes, one sample per grid step); the raw [N, S, 4] float32
contract is unchanged, so the tested ``ops.composite`` path applies as-is.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pronerf_tpu.kernels.fused_nerf import (
    L_PTS,
    W,
    W_HALF,
    _freq_matrix,
    _split_pe_rows,
)
from pronerf_tpu.ops.encoding import positional_encoding

# Calibration headroom: maxima measured on the synthetic sweep are inflated
# by this factor so real-scene activations slightly past the sweep's
# envelope quantize instead of clipping.
_CAL_MARGIN = 1.10


def calibrate_nerf_ranges(nerf_params, n: int = 8192, pts=None, dirs=None):
    """Per-tensor activation ranges for the int8 chain.

    Runs the f32 NeRF forward on ``n`` synthetic query points spanning the
    NDC volume the serving path actually evaluates (x, y in ~[-1, 1] plus
    offset slack, z in [0, 1]; random unit view directions) and records the
    range of every tensor the kernel quantizes. Pure jnp — safe to trace.

    Returns {"h0".."h7": (0, max), "feat": (min, max), "hv": (0, max)}
    with ``_CAL_MARGIN`` headroom applied.
    """
    p = nerf_params
    if pts is None:
        key = jax.random.PRNGKey(20260818)
        kp, kd = jax.random.split(key)
        lo = jnp.asarray([-1.25, -1.25, -0.1], jnp.float32)
        hi = jnp.asarray([1.25, 1.25, 1.1], jnp.float32)
        pts = lo + (hi - lo) * jax.random.uniform(kp, (n, 3), jnp.float32)
        dirs = jax.random.normal(kd, (n, 3), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    x_pe = positional_encoding(pts, L_PTS)            # [n, 63]
    d_pe = positional_encoding(dirs, 4)               # [n, 27]

    ranges = {}

    def fmax(h, name):
        # per-CHANNEL ranges (see module docstring); post-ReLU min is 0
        ranges[name] = (
            jnp.zeros((h.shape[-1],), jnp.float32),
            jnp.max(h, axis=0) * _CAL_MARGIN,
        )
        return h

    h = x_pe
    for i, layer in enumerate(p["pts"]):
        inp = jnp.concatenate([x_pe, h], axis=-1) if i == 5 else h
        h = fmax(jax.nn.relu(inp @ layer["w"] + layer["b"]), f"h{i}")
    feat = h @ p["feature"]["w"] + p["feature"]["b"]
    mn = jnp.min(feat, axis=0)
    mx = jnp.max(feat, axis=0)
    c = 0.5 * (mn + mx)
    half = 0.5 * (mx - mn) * _CAL_MARGIN
    ranges["feat"] = (c - half, c + half)
    wv = p["views"]["w"]
    hv = jax.nn.relu(
        feat @ wv[:W] + d_pe @ wv[W:] + p["views"]["b"]
    )
    fmax(hv, "hv")
    return ranges


def _qweight(w_t):
    """Symmetric per-output-channel int8: returns (w_q [M, K] int8,
    s_w [M, 1] f32, rowsum_q [M, 1] f32, rowsum_exact [M, 1] f32)."""
    w_t = jnp.asarray(w_t, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w_t), axis=1, keepdims=True), 1e-12)
    s = s / 127.0
    wq = jnp.clip(jnp.round(w_t / s), -127, 127).astype(jnp.int8)
    return (
        wq, s,
        jnp.sum(wq.astype(jnp.float32), axis=1, keepdims=True),
        jnp.sum(w_t, axis=1, keepdims=True),
    )


def _fold(w_t, b, s_in, m_in, s_out=None, m_out=None):
    """Quantize one layer and fold every scale into (w_q, A, B):
    ``t = acc_i32 * A + B`` is the layer output in OUTPUT-quant units when
    ``s_out`` is given (requantize with ``_requant``), else in f32 units
    (final heads).

    ``s_in``/``m_in`` are PER-INPUT-CHANNEL [K] vectors (the input's affine
    quant); ``s_out``/``m_out`` per-output-channel [M] vectors. diag(s_in)
    folds into the weight columns before the per-row weight quant, and the
    exact offset term ``w @ m_in`` folds into B."""
    w_t = jnp.asarray(w_t, jnp.float32)               # [M, K]
    wq, s_w, rs_q, _ = _qweight(w_t * s_in[None, :])
    b = jnp.asarray(b, jnp.float32).reshape(-1, 1)
    A = s_w
    B = 127.0 * s_w * rs_q + (w_t @ m_in).reshape(-1, 1) + b
    if s_out is not None:
        inv = (1.0 / s_out).reshape(-1, 1)
        A = A * inv
        B = (B - m_out.reshape(-1, 1)) * inv
    return wq, A.astype(jnp.float32), B.astype(jnp.float32)


def pack_nerf_params_int8(nerf_params, ranges=None, pe_dtype=jnp.bfloat16):
    """Pack the NeRF params into int8 kernel panels (+ bf16 PE panels).

    ``ranges`` defaults to ``calibrate_nerf_ranges(nerf_params)``. Scales
    and corrections are folded per the module docstring; the returned dict
    feeds :func:`fused_nerf_raw_tq`.
    """
    if ranges is None:
        ranges = calibrate_nerf_ranges(nerf_params)
    p = nerf_params

    def scale_of(name):
        m, mx = ranges[name]
        m = jnp.asarray(m, jnp.float32).reshape(-1)
        mx = jnp.asarray(mx, jnp.float32).reshape(-1)
        return jnp.maximum(mx - m, 1e-12) / 254.0, m

    # --- PE consumers stay bf16 (rows reordered [x | sin | cos] exactly as
    # the bf16 kernel: fused_nerf.pack_nerf_params).
    w0x, w0s, w0c = _split_pe_rows(p["pts"][0]["w"], L_PTS)
    w5 = jnp.asarray(p["pts"][5]["w"])
    w5x, w5s, w5c = _split_pe_rows(w5[:63], L_PTS)
    w0p = jnp.concatenate([w0x, w0s, w0c], axis=0)
    w5p = jnp.concatenate([w5x, w5s, w5c], axis=0)

    s0, m0 = scale_of("h0")
    s5, m5 = scale_of("h5")

    packed = {
        "bx_t": _freq_matrix(L_PTS, pe_dtype).T,
        "w0p_t": w0p.T.astype(pe_dtype),
        # layer 0 output straight into h0-quant units (per-channel)
        "A0": (1.0 / s0).reshape(-1, 1).astype(jnp.float32),
        "B0": (
            jnp.asarray(p["pts"][0]["b"]).reshape(-1, 1)
            / s0.reshape(-1, 1)
        ).astype(jnp.float32),
        # w5 PE half pre-scaled per-OUTPUT-channel by inv_s5 so its f32 acc
        # adds directly to the layer-5 requant expression
        "w5p_t": (w5p / s5[None, :]).T.astype(pe_dtype),
    }

    s_prev, m_prev = s0, m0
    for i in (1, 2, 3, 4):
        s_i, m_i = scale_of(f"h{i}")
        wq, A, B = _fold(
            jnp.asarray(p["pts"][i]["w"]).T, p["pts"][i]["b"],
            s_prev, m_prev, s_out=s_i, m_out=m_i,
        )
        packed[f"w{i}q"], packed[f"A{i}"], packed[f"B{i}"] = wq, A, B
        s_prev, m_prev = s_i, m_i

    # layer 5: int8 on the h4 half; PE half arrives as pre-scaled f32 acc
    wq, A, B = _fold(
        w5[63:].T, p["pts"][5]["b"], s_prev, m_prev, s_out=s5, m_out=m5
    )
    packed["w5q"], packed["A5"], packed["B5"] = wq, A, B
    s_prev, m_prev = s5, m5
    for i in (6, 7):
        s_i, m_i = scale_of(f"h{i}")
        wq, A, B = _fold(
            jnp.asarray(p["pts"][i]["w"]).T, p["pts"][i]["b"],
            s_prev, m_prev, s_out=s_i, m_out=m_i,
        )
        packed[f"w{i}q"], packed[f"A{i}"], packed[f"B{i}"] = wq, A, B
        s_prev, m_prev = s_i, m_i
    s7, m7 = s_prev, m_prev

    # alpha head (padded to 8 rows), f32 out
    w_alpha = jnp.zeros((W, 8)).at[:, :1].set(jnp.asarray(p["alpha"]["w"]))
    b_alpha = jnp.zeros((8,)).at[:1].set(jnp.asarray(p["alpha"]["b"]))
    wq, A, B = _fold(w_alpha.T, b_alpha, s7, m7)
    packed["waq"], packed["Aa"], packed["Ba"] = wq, A, B

    # feature layer (linear -> affine output quant)
    s_f, m_f = scale_of("feat")
    wq, A, B = _fold(
        jnp.asarray(p["feature"]["w"]).T, p["feature"]["b"],
        s7, m7, s_out=s_f, m_out=m_f,
    )
    packed["wfq"], packed["Af"], packed["Bf"] = wq, A, B

    # views layer: int8 on the feature half; the d_pe contribution (vcon)
    # arrives as an f32 input pre-scaled per-channel by inv_s_hv in the
    # wrapper
    s_hv, m_hv = scale_of("hv")
    wv = jnp.asarray(p["views"]["w"])
    wq, A, B = _fold(
        wv[:W].T, p["views"]["b"], s_f, m_f, s_out=s_hv, m_out=m_hv
    )
    packed["wvq"], packed["Av"], packed["Bv"] = wq, A, B
    packed["vcon_scale"] = (1.0 / s_hv).reshape(-1, 1).astype(jnp.float32)

    # rgb head (padded to 8 rows), f32 out
    w_rgb = jnp.zeros((W_HALF, 8)).at[:, :3].set(jnp.asarray(p["rgb"]["w"]))
    b_rgb = jnp.zeros((8,)).at[:3].set(jnp.asarray(p["rgb"]["b"]))
    wq, A, B = _fold(w_rgb.T, b_rgb, s_hv, m_hv)
    packed["wrq"], packed["Ar"], packed["Br"] = wq, A, B
    return packed


_ORDER = (
    "bx_t", "w0p_t", "A0", "B0",
    "w1q", "A1", "B1", "w2q", "A2", "B2",
    "w3q", "A3", "B3", "w4q", "A4", "B4",
    "w5p_t", "w5q", "A5", "B5",
    "w6q", "A6", "B6", "w7q", "A7", "B7",
    "waq", "Aa", "Ba", "wfq", "Af", "Bf",
    "wvq", "Av", "Bv",
    "wrq", "Ar", "Br",
)


def _mmf(w_t, x_t):
    """bf16 MXU matmul with f32 accumulation, f32 out (PE consumers)."""
    return jax.lax.dot_general(
        w_t, x_t.astype(w_t.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mmi(w_q, x_q):
    """int8 x int8 -> int32 MXU matmul."""
    return jax.lax.dot_general(
        w_q, x_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _requant(t):
    """f32 in output-quant units -> int8 code. The lower clip doubles as
    ReLU for layers whose output offset is 0."""
    return (
        jnp.clip(jnp.floor(t + 0.5), 0.0, 254.0) - 127.0
    ).astype(jnp.int8)


def _forward_q(pts3, vcon_ref, ws):
    """Quantized PE -> MLP chain for one sample of a ray block; pts3
    [3, R] f32, vcon_ref [128, R] f32 ALREADY scaled by inv_s_hv."""
    (bx_t, w0p_t, A0, B0,
     w1q, A1, B1, w2q, A2, B2, w3q, A3, B3, w4q, A4, B4,
     w5p_t, w5q, A5, B5,
     w6q, A6, B6, w7q, A7, B7,
     waq, Aa, Ba, wfq, Af, Bf,
     wvq, Av, Bv,
     wrq, Ar, Br) = ws

    pdt = w0p_t.dtype
    x = pts3.astype(pdt)
    xb = _mmf(bx_t[:], x)
    sx = jnp.sin(xb).astype(pdt)
    cx = jnp.cos(xb).astype(pdt)
    pe = jnp.concatenate([x, sx, cx], axis=0)          # [63, R]

    h = _requant(_mmf(w0p_t[:], pe) * A0[:] + B0[:])   # int8 [256, R]
    h = _requant(_mmi(w1q[:], h).astype(jnp.float32) * A1[:] + B1[:])
    h = _requant(_mmi(w2q[:], h).astype(jnp.float32) * A2[:] + B2[:])
    h = _requant(_mmi(w3q[:], h).astype(jnp.float32) * A3[:] + B3[:])
    h = _requant(_mmi(w4q[:], h).astype(jnp.float32) * A4[:] + B4[:])
    h = _requant(
        _mmi(w5q[:], h).astype(jnp.float32) * A5[:]
        + _mmf(w5p_t[:], pe) + B5[:]
    )
    h = _requant(_mmi(w6q[:], h).astype(jnp.float32) * A6[:] + B6[:])
    h = _requant(_mmi(w7q[:], h).astype(jnp.float32) * A7[:] + B7[:])

    sigma = _mmi(waq[:], h).astype(jnp.float32) * Aa[:] + Ba[:]  # [8, R]
    fq = _requant(_mmi(wfq[:], h).astype(jnp.float32) * Af[:] + Bf[:])
    hv = _requant(
        _mmi(wvq[:], fq).astype(jnp.float32) * Av[:]
        + vcon_ref[:].astype(jnp.float32) + Bv[:]
    )
    rgb = _mmi(wrq[:], hv).astype(jnp.float32) * Ar[:] + Br[:]   # [8, R]
    return rgb, sigma


def _kernel(pts_ref, vcon_ref, *refs):
    ws, out_ref = refs[:-1], refs[-1]
    rgb, sigma = _forward_q(pts_ref[:].reshape(3, -1), vcon_ref, ws)
    out_ref[:] = jnp.concatenate([rgb[:3], sigma[:1]], axis=0)[None]


@functools.partial(
    jax.jit, static_argnames=("n_samples", "rays_per_block", "interpret")
)
def fused_nerf_raw_tq(
    packed,
    pts24_t,
    vcon_t,
    n_samples: int = 8,
    rays_per_block: int = 4096,
    interpret: bool = False,
):
    """INT8 fused PE -> NeRF MLP forward. Same contract/grid/layout as
    ``fused_nerf.fused_nerf_raw_t``; ``packed`` from
    :func:`pack_nerf_params_int8`. Returns raw [N, S, 4] float32."""
    S = n_samples
    N = pts24_t.shape[1]
    nb = -(-N // rays_per_block)
    padn = nb * rays_per_block - N
    vcon_t = vcon_t.astype(jnp.float32) * packed["vcon_scale"]
    if padn:
        pts24_t = jnp.pad(pts24_t, ((0, 0), (0, padn)))
        vcon_t = jnp.pad(vcon_t, ((0, 0), (0, padn)))
    Np = nb * rays_per_block
    pts_s3 = pts24_t.reshape(S, 3, Np)

    weights = [packed[k] for k in _ORDER]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda b, s: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        grid=(nb, S),
        in_specs=[
            pl.BlockSpec((1, 3, rays_per_block), lambda b, s: (s, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W_HALF, rays_per_block), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
        ] + [full(w) for w in weights],
        out_specs=pl.BlockSpec((1, 4, rays_per_block),
                               lambda b, s: (s, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 4, Np), jnp.float32),
        interpret=interpret,
    )(pts_s3, vcon_t, *weights)

    return out.transpose(2, 0, 1)[:N]
