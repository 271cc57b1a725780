"""Pallas TPU kernel fusing the inference hot path: positional encoding ->
NeRF MLP (8x256, skip@4, view branch) -> alpha compositing.

Why a kernel: under plain XLA each MLP layer's [P, 256] activation round-
trips through HBM (measured ~16 ms/frame at fern scale, vs ~4 ms of MXU
time). Here the whole chain runs per ray-block with weights and activations
resident in VMEM; HBM traffic is just points in, composited rays out.

Layout: weights are pre-padded (``pack_nerf_params``) so every contraction
is lane-aligned:
- encoded position 63ch -> padded 64; skip concat 319 -> 320;
- view branch input 256+27 -> 288 (27ch dir encoding zero-padded);
- alpha/rgb heads padded to 128 output lanes (cols 0.. hold the signal).
Matmuls run in bf16 with f32 MXU accumulation (matching the bf16 fast-path
semantics of the XLA renderer); compositing math stays f32.

Numerical semantics mirror ``ops.composite`` in inference mode: density
corrections always applied, no clamp, no noise
(``run_S_eS_eN_alter_trt.py:564-597``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 8          # samples per ray
L_PTS = 10     # position encoding octaves -> 63ch
L_DIR = 4      # direction encoding octaves -> 27ch
PE_PTS = 64    # padded 3 + 60 = 63 -> 64
PE_DIR = 32    # padded 27 -> 32
W = 256
W_HALF = 128
INF_DIST = 1e10


def pack_nerf_params(nerf_params, dtype=jnp.bfloat16):
    """Pad the NeRF param pytree into lane-aligned kernel buffers."""

    def pad(a, rows, cols):
        a = jnp.asarray(a)
        return jnp.zeros((rows, cols), a.dtype).at[: a.shape[0], : a.shape[1]].set(a).astype(dtype)

    def padb(b, cols):
        # biases stay f32 and 2-D ([1, cols]) for clean VMEM tiling
        b = jnp.asarray(b)
        return (
            jnp.zeros((1, cols), b.dtype).at[0, : b.shape[0]].set(b)
        ).astype(jnp.float32)

    p = nerf_params
    packed = {
        "w0": pad(p["pts"][0]["w"], PE_PTS, W),
        "w5": pad(p["pts"][5]["w"], PE_PTS + W, W),
    }
    # skip layer 5 consumes cat(x_pe[63], h[256]): remap its rows so the
    # first PE_PTS rows are the (padded) x part and the next W rows are h.
    w5 = jnp.asarray(p["pts"][5]["w"])  # [319, 256]
    packed["w5"] = (
        jnp.zeros((PE_PTS + W, W), w5.dtype)
        .at[:63].set(w5[:63])
        .at[PE_PTS:].set(w5[63:])
        .astype(dtype)
    )
    for i in (1, 2, 3, 4, 6, 7):
        packed[f"w{i}"] = jnp.asarray(p["pts"][i]["w"]).astype(dtype)
    for i in range(8):
        packed[f"b{i}"] = padb(p["pts"][i]["b"], W)
    packed["w_alpha"] = pad(p["alpha"]["w"], W, W_HALF)
    packed["b_alpha"] = padb(p["alpha"]["b"], W_HALF)
    packed["w_feat"] = jnp.asarray(p["feature"]["w"]).astype(dtype)
    packed["b_feat"] = padb(p["feature"]["b"], W)
    # view branch consumes cat(feature[256], d_pe[27]) -> rows [256 | 27pad32]
    wv = jnp.asarray(p["views"]["w"])  # [283, 128]
    packed["w_views"] = (
        jnp.zeros((W + PE_DIR, W_HALF), wv.dtype)
        .at[:W].set(wv[:W])
        .at[W : W + 27].set(wv[W:])
        .astype(dtype)
    )
    packed["b_views"] = padb(p["views"]["b"], W_HALF)
    packed["w_rgb"] = pad(p["rgb"]["w"], W_HALF, W_HALF)
    packed["b_rgb"] = padb(p["rgb"]["b"], W_HALF)
    return packed


def _posenc(x, num_freqs, out_cols):
    """[..., 3] -> [..., out_cols] padded positional encoding (f32)."""
    feats = [x]
    for k in range(num_freqs):
        feats.append(jnp.sin(x * (2.0**k)))
        feats.append(jnp.cos(x * (2.0**k)))
    enc = jnp.concatenate(feats, axis=-1)
    pad = out_cols - enc.shape[-1]
    return jnp.pad(enc, [(0, 0)] * (enc.ndim - 1) + [(0, pad)])


def _mm(x, w, b):
    y = jax.lax.dot_general(
        x.astype(w.dtype), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y + b  # b is [1, cols]


def _kernel(
    pts_ref, dirs_ref, z_ref, dnorm_ref, add_ref, mul_ref,
    *weight_refs,
):
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7,
     w_alpha, b_alpha, w_feat, b_feat, w_views, b_views, w_rgb, b_rgb,
     out_ref) = weight_refs

    R = pts_ref.shape[0]
    P = R * S

    pts = pts_ref[:].reshape(P, 3)
    x_pe = _posenc(pts, L_PTS, PE_PTS)

    h = jnp.maximum(_mm(x_pe, w0[:], b0[:]), 0.0)
    h = jnp.maximum(_mm(h, w1[:], b1[:]), 0.0)
    h = jnp.maximum(_mm(h, w2[:], b2[:]), 0.0)
    h = jnp.maximum(_mm(h, w3[:], b3[:]), 0.0)
    h = jnp.maximum(_mm(h, w4[:], b4[:]), 0.0)
    # skip: layer 5 sees [x_pe | h]
    h = jnp.maximum(
        _mm(x_pe, w5[:PE_PTS, :], b5[:]) +
        jax.lax.dot_general(
            h.astype(w5.dtype), w5[PE_PTS:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        0.0,
    )
    h = jnp.maximum(_mm(h, w6[:], b6[:]), 0.0)
    h = jnp.maximum(_mm(h, w7[:], b7[:]), 0.0)

    sigma = _mm(h, w_alpha[:], b_alpha[:])[:, :1]  # [P, 1]
    feat = _mm(h, w_feat[:], b_feat[:])           # [P, 256]

    dirs = dirs_ref[:]                             # [R, 3]
    d_pe = _posenc(dirs, L_DIR, PE_DIR)            # [R, 32]
    d_pe_full = jnp.repeat(d_pe, S, axis=0)        # [P, 32]
    hv = jnp.maximum(
        _mm(feat, w_views[:W, :], b_views[:]) +
        jax.lax.dot_general(
            d_pe_full.astype(w_views.dtype), w_views[W:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        0.0,
    )
    rgb_logits = _mm(hv, w_rgb[:], b_rgb[:])[:, :3]  # [P, 3]

    # ---- compositing over S (inference semantics: mm terms, no clamp) ----
    z = z_ref[:]                                   # [R, S]
    dnorm = dnorm_ref[:]                           # [R, 1]
    sigma = sigma[:, 0].reshape(R, S)
    rgb = jax.nn.sigmoid(rgb_logits).reshape(R, S, 3)

    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((R, 1), INF_DIST, z.dtype)], axis=1
    ) * dnorm
    a = jnp.maximum(sigma + add_ref[:], 0.0)
    alpha = (1.0 - jnp.exp(-a * dists)) * jnp.maximum(mul_ref[:], 0.0)

    # exclusive cumprod over the (static, small) sample axis, unrolled
    one_m = 1.0 - alpha + 1e-10
    trans_cols = [jnp.ones((R, 1), z.dtype)]
    for s_i in range(1, S):
        trans_cols.append(trans_cols[-1] * one_m[:, s_i - 1 : s_i])
    trans = jnp.concatenate(trans_cols, axis=1)
    weights = alpha * trans                         # [R, S]

    rgb_map = jnp.sum(weights[:, :, None] * rgb, axis=1)   # [R, 3]
    depth = jnp.sum(weights * z, axis=1)
    acc = jnp.sum(weights, axis=1)

    out = jnp.concatenate(
        [rgb_map, depth[:, None], acc[:, None], jnp.zeros((R, 3), z.dtype)],
        axis=1,
    )
    out_ref[:] = out


_WEIGHT_ORDER = (
    "w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7",
    "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7",
    "w_alpha", "b_alpha", "w_feat", "b_feat", "w_views", "b_views",
    "w_rgb", "b_rgb",
)


@functools.partial(jax.jit, static_argnames=("block_rays", "interpret"))
def fused_nerf_composite(
    packed,
    pts,
    dirs,
    z_vals,
    dnorm,
    mm_add,
    mm_mul,
    block_rays: int = 512,
    interpret: bool = False,
):
    """Fused PE -> NeRF MLP -> composite.

    Args:
      packed: ``pack_nerf_params`` output.
      pts: [N, S, 3] NDC query points.
      dirs: [N, 3] unit view directions.
      z_vals: [N, S] sample depths (sorted).
      dnorm: [N] norm of the NDC ray direction (interval scaling).
      mm_add, mm_mul: [N, S] sampler density corrections.

    Returns: dict(rgb [N, 3], depth [N], acc [N]).
    """
    N = pts.shape[0]
    n_blocks = -(-N // block_rays)
    pad = n_blocks * block_rays - N
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
        dirs = jnp.pad(dirs, ((0, pad), (0, 0)))
        z_vals = jnp.pad(z_vals, ((0, pad), (0, 0)))
        dnorm = jnp.pad(dnorm, ((0, pad),))
        mm_add = jnp.pad(mm_add, ((0, pad), (0, 0)))
        mm_mul = jnp.pad(mm_mul, ((0, pad), (0, 0)))

    ray_spec = lambda cols: pl.BlockSpec(
        (block_rays, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)

    weights = [packed[k] for k in _WEIGHT_ORDER]
    out = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rays, S, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec(3),
            ray_spec(S),
            ray_spec(1),
            ray_spec(S),
            ray_spec(S),
        ] + [full(w) for w in weights],
        out_specs=ray_spec(8),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_rays, 8), jnp.float32),
        interpret=interpret,
    )(pts, dirs, z_vals, dnorm[:, None], mm_add, mm_mul, *weights)

    out = out[:N]
    return {"rgb": out[:, :3], "depth": out[:, 3], "acc": out[:, 4]}
