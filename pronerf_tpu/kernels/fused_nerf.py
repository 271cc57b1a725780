"""Pallas TPU kernel for the inference hot path: positional encoding ->
NeRF MLP (8x256, skip@4, view branch) -> raw [N, S, 4] radiance outputs.

Why a kernel: under plain XLA each MLP layer's [P, 256] activation round-
trips through HBM (1.5M points x 256 x bf16 x read+write ~ 1.9 ms/layer at
fern scale — the stage is bandwidth-bound at ~21 ms/frame); here the chain
runs per ray-block with weights and activations resident in VMEM (measured
13.8 ms for the pure matmul chain at the same shapes, 64% MFU).

Kernel-shaping decisions (all measured on TPU v5e):
- the positional encoding is FORMULATED AS MATMULS: xb = x @ B (B holds the
  2^k frequency pattern), then sin/cos on [P, 30] panels, and the first /
  skip layers consume (x, sin xb, cos xb) through row-split weight panels;
- compositing and the view-direction ENCODING live OUTSIDE the kernel:
  the in-kernel [R, 1]-wide transmittance/concat chain of the v1 kernel
  cost ~10 ms of lane-sliver VPU work (23.5 ms v1 vs 13.8 ms chain); the
  caller passes the per-ray view contribution vcon = d_pe @ w_views[256:]
  ([N, 128], tiny in XLA) and feeds the raw output to the tested
  ``ops.composite``;
- matmuls run in bf16 with f32 MXU accumulation (Mosaic requires 32-bit
  accumulators), rounded to the pack dtype per dot;
- block sizes >= 512 rays (and 384-ray blocks at ~500-step grids) crash
  the Mosaic compiler (2026-08 v5e toolchain) — default 256 rays/block.

Numerical semantics mirror ``models.mlp.nerf_mlp_apply`` with a per-ray
d_pe; the reference runs this net as its TRT FP16 NeRF engine
(``trt_infer_v2.py:248-295``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L_PTS = 10     # position octaves: PE = [x(3), sin(30), cos(30)]
L_DIR = 4      # direction octaves: PE = [d(3), sin(12), cos(12)]
W = 256
W_HALF = 128


def _freq_matrix(L: int, dtype=jnp.float32):
    """B [3, 3L] with B[j, 3k + j] = 2^k, so (x @ B)[:, 3k + j] = 2^k x_j —
    matching the interleaved [sin f_k x, cos f_k x] row order of
    ``ops.encoding.positional_encoding``."""
    B = np.zeros((3, 3 * L), np.float32)
    for k in range(L):
        for j in range(3):
            B[j, 3 * k + j] = 2.0**k
    return jnp.asarray(B, dtype)


def _split_pe_rows(w, L: int):
    """Split a weight matrix whose rows consume a positional encoding
    [x(3), sin f0(3), cos f0(3), ..., sin f_{L-1}(3), cos f_{L-1}(3)]
    into (x rows [3, N], sin rows [3L, N], cos rows [3L, N])."""
    w = jnp.asarray(w)
    wx = w[:3]
    sin_rows = [3 + 6 * k + j for k in range(L) for j in range(3)]
    cos_rows = [3 + 6 * k + 3 + j for k in range(L) for j in range(3)]
    return wx, w[jnp.asarray(sin_rows)], w[jnp.asarray(cos_rows)]


def pack_nerf_params(nerf_params, dtype=jnp.bfloat16):
    """Split/reorder the NeRF param pytree into kernel panels.

    ``dtype`` governs matmul inputs AND inter-layer activations/biases
    (float32 = exact; bfloat16 = the serving fast path: halves VMEM and
    VPU traffic, MXU still accumulates f32 per pass)."""
    p = nerf_params

    def cast(a):
        return jnp.asarray(a).astype(dtype)

    def bias(b):
        return jnp.asarray(b).reshape(1, -1).astype(dtype)

    w0x, w0s, w0c = _split_pe_rows(p["pts"][0]["w"], L_PTS)
    w5 = jnp.asarray(p["pts"][5]["w"])  # [63 + 256, 256]: [x_pe | h]
    w5x, w5s, w5c = _split_pe_rows(w5[:63], L_PTS)

    # One K=63 MXU pass per PE consumer instead of three tiny-K dots:
    # rows ordered [x(3) | sin(30) | cos(30)] to match the in-kernel
    # concat([x, sin xb, cos xb]).
    w0p = jnp.concatenate([w0x, w0s, w0c], axis=0)
    w5p = jnp.concatenate([w5x, w5s, w5c], axis=0)

    packed = {
        "bx": _freq_matrix(L_PTS, dtype),
        "w0p": cast(w0p),
        "b0": bias(p["pts"][0]["b"]),
        "w5p": cast(w5p),
        "w5h": cast(w5[63:]),
        "b5": bias(p["pts"][5]["b"]),
        "wvf": cast(jnp.asarray(p["views"]["w"])[:W]),
        "bv": bias(p["views"]["b"]),
        "w_alpha": cast(
            jnp.zeros((W, W_HALF)).at[:, :1].set(jnp.asarray(p["alpha"]["w"]))
        ),
        "b_alpha": bias(
            jnp.zeros((W_HALF,)).at[:1].set(jnp.asarray(p["alpha"]["b"]))
        ),
        "w_feat": cast(p["feature"]["w"]),
        "b_feat": bias(p["feature"]["b"]),
        "w_rgb": cast(
            jnp.zeros((W_HALF, W_HALF)).at[:, :3].set(jnp.asarray(p["rgb"]["w"]))
        ),
        "b_rgb": bias(
            jnp.zeros((W_HALF,)).at[:3].set(jnp.asarray(p["rgb"]["b"]))
        ),
    }
    for i in (1, 2, 3, 4, 6, 7):
        packed[f"w{i}"] = cast(p["pts"][i]["w"])
        packed[f"b{i}"] = bias(p["pts"][i]["b"])
    return packed


_WEIGHT_ORDER = (
    "bx",
    "w0p", "b0",
    "w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4",
    "w5p", "w5h", "b5",
    "w6", "b6", "w7", "b7",
    "w_alpha", "b_alpha", "w_feat", "b_feat",
    "wvf", "bv",
    "w_rgb", "b_rgb",
)


def _dot(x, w):
    """MXU matmul: f32 accumulation (Mosaic requires a 32-bit acc), result
    rounded to the compute dtype — so inter-layer activations stay bf16 on
    the serving path (halved VMEM/VPU traffic), one rounding per dot."""
    return jax.lax.dot_general(
        x.astype(w.dtype), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)


def _make_kernel(S: int):
    def _kernel(pts_ref, vcon_ref, *refs):
        (bx,
         w0p, b0,
         w1, b1, w2, b2, w3, b3, w4, b4,
         w5p, w5h, b5,
         w6, b6, w7, b7,
         w_alpha, b_alpha, w_feat, b_feat,
         wvf, bv,
         w_rgb, b_rgb,
         out_ref) = refs

        P = pts_ref.shape[0]         # rays_per_block * S point rows
        R = P // S
        cdt = w1.dtype

        x = pts_ref[:].astype(cdt)             # [P, 3]
        xb = _dot(x, bx[:])                    # [P, 30]
        sx = jnp.sin(xb.astype(jnp.float32)).astype(cdt)
        cx = jnp.cos(xb.astype(jnp.float32)).astype(cdt)
        pe = jnp.concatenate([x, sx, cx], axis=1)  # [P, 63]

        h = jnp.maximum(_dot(pe, w0p[:]) + b0[:], 0.0)
        h = jnp.maximum(_dot(h, w1[:]) + b1[:], 0.0)
        h = jnp.maximum(_dot(h, w2[:]) + b2[:], 0.0)
        h = jnp.maximum(_dot(h, w3[:]) + b3[:], 0.0)
        h = jnp.maximum(_dot(h, w4[:]) + b4[:], 0.0)
        h = jnp.maximum(
            _dot(pe, w5p[:]) + _dot(h, w5h[:]) + b5[:], 0.0
        )
        h = jnp.maximum(_dot(h, w6[:]) + b6[:], 0.0)
        h = jnp.maximum(_dot(h, w7[:]) + b7[:], 0.0)

        sigma = _dot(h, w_alpha[:]) + b_alpha[:]        # [P, 128] (col 0)
        feat = _dot(h, w_feat[:]) + b_feat[:]           # [P, 256]

        vcon = vcon_ref[:]                              # [R, 128]
        vcon_p = jnp.broadcast_to(
            vcon[:, None, :].astype(cdt), (R, S, W_HALF)
        ).reshape(P, W_HALF)
        hv = jnp.maximum(_dot(feat, wvf[:]) + vcon_p + bv[:], 0.0)
        rgb = _dot(hv, w_rgb[:]) + b_rgb[:]             # [P, 128] (cols 0:3)

        out_ref[:] = jnp.concatenate(
            [rgb[:, :3], sigma[:, :1]], axis=1
        ).astype(jnp.float32)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("rays_per_block", "interpret")
)
def fused_nerf_raw(
    packed,
    pts,
    vcon,
    rays_per_block: int = 256,
    interpret: bool = False,
):
    """Fused PE -> NeRF MLP forward (no AD; inference path).

    Args:
      packed: ``pack_nerf_params`` output.
      pts: [N, S, 3] NDC query points (offsets already applied).
      vcon: [N, 128] per-ray view-direction contribution
        ``d_pe @ views_w[256:]`` (bias excluded — it is added in-kernel).

    Returns: raw [N, S, 4] float32 (rgb logits, sigma) — the same contract
    as ``nerf_mlp_apply``, ready for ``ops.composite``.
    """
    N, S = pts.shape[0], pts.shape[1]
    nb = -(-N // rays_per_block)
    pad = nb * rays_per_block - N
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
        vcon = jnp.pad(vcon, ((0, pad), (0, 0)))
    rows = rays_per_block * S
    pts_flat = pts.reshape(nb * rows, 3)

    weights = [packed[k] for k in _WEIGHT_ORDER]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_kernel(S),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rows, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rays_per_block, W_HALF), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [full(w) for w in weights],
        out_specs=pl.BlockSpec((rows, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * rows, 4), jnp.float32),
        interpret=interpret,
    )(pts_flat, vcon, *weights)

    return out.reshape(nb * rays_per_block, S, 4)[:N]
