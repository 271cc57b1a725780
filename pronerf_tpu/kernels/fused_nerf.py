"""Pallas TPU kernel for the inference hot path: positional encoding ->
NeRF MLP (8x256, skip@4, view branch) -> raw [N, S, 4] radiance outputs.

Why a kernel: under plain XLA each MLP layer's [P, 256] activation round-
trips through HBM (1.5M points x 256 x bf16 x read+write ~ 1.9 ms/layer at
fern scale — the stage is bandwidth-bound at ~21 ms/frame); here the chain
runs per point-block with weights and activations resident in VMEM
(measured 13.8 ms for the pure matmul chain at the same shapes, 64% MFU).

The kernel is TRANSPOSED: activations are [features, points] — features on
sublanes, points on lanes. Measured rationale (op-level profile of the
row-major v2): with [P, 3]-shaped inputs the surrounding XLA graph spent
7.1 ms/frame on relayout copies (compact N-minor layouts <-> the row-major
[P, small] arrays Pallas requires), and every narrow slice/concat inside
the kernel was a lane-sliver VPU op. Transposed:
- the XLA-side reshape/transpose of [N, S, 3] -> [3, P] and [4, P] ->
  [N, S, 4] are layout-neutral (points stay minor) — no relayout copies;
- sin/cos and the PE concat run on [30/63, Pb] panels with FULL lane
  utilization; rgb/sigma extraction are sublane slices;
- matmuls become w_T [out, in] @ h_T [in, Pb] — the same MXU shapes.

Compositing and the view-direction ENCODING live outside the kernel: the
caller passes vcon_t = (d_pe @ views_w[256:]).T ([128, N], tiny in XLA) and
feeds the raw output to the tested ``ops.composite``. Matmuls run in bf16
with f32 MXU accumulation (Mosaic requires 32-bit accumulators), rounded to
the pack dtype per dot.

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
    """Split/reorder the NeRF param pytree into TRANSPOSED kernel panels
    (w_T [out, in]; biases as [out, 1] columns).

    ``dtype`` governs matmul inputs AND inter-layer activations/biases
    (float32 = exact; bfloat16 = the serving fast path: halves VMEM and
    VPU traffic, MXU still accumulates f32 per pass)."""
    p = nerf_params

    def wt(a):
        return jnp.asarray(a).T.astype(dtype)

    def bias(b):
        return jnp.asarray(b).reshape(-1, 1).astype(dtype)

    w0x, w0s, w0c = _split_pe_rows(p["pts"][0]["w"], L_PTS)
    w5 = jnp.asarray(p["pts"][5]["w"])  # [63 + 256, 256]: [x_pe | h]
    w5x, w5s, w5c = _split_pe_rows(w5[:63], L_PTS)

    # One K=63 MXU pass per PE consumer: rows ordered [x(3)|sin(30)|cos(30)]
    # to match the in-kernel sublane concat([x, sin xb, cos xb]).
    w0p = jnp.concatenate([w0x, w0s, w0c], axis=0)
    w5p = jnp.concatenate([w5x, w5s, w5c], axis=0)

    # alpha/rgb heads padded to 8 output rows (sublane tile)
    w_alpha = jnp.zeros((W, 8)).at[:, :1].set(jnp.asarray(p["alpha"]["w"]))
    b_alpha = jnp.zeros((8,)).at[:1].set(jnp.asarray(p["alpha"]["b"]))
    w_rgb = jnp.zeros((W_HALF, 8)).at[:, :3].set(jnp.asarray(p["rgb"]["w"]))
    b_rgb = jnp.zeros((8,)).at[:3].set(jnp.asarray(p["rgb"]["b"]))

    packed = {
        "bx_t": _freq_matrix(L_PTS, dtype).T,        # [30, 3]
        "w0p_t": wt(w0p), "b0": bias(p["pts"][0]["b"]),
        "w5p_t": wt(w5p), "w5h_t": wt(w5[63:]),
        "b5": bias(p["pts"][5]["b"]),
        "w_alpha_t": wt(w_alpha), "b_alpha": bias(b_alpha),
        "w_feat_t": wt(p["feature"]["w"]), "b_feat": bias(p["feature"]["b"]),
        "wvf_t": wt(jnp.asarray(p["views"]["w"])[:W]),
        "bv": bias(p["views"]["b"]),
        "w_rgb_t": wt(w_rgb), "b_rgb": bias(b_rgb),
    }
    for i in (1, 2, 3, 4, 6, 7):
        packed[f"w{i}_t"] = wt(p["pts"][i]["w"])
        packed[f"b{i}"] = bias(p["pts"][i]["b"])
    return packed


_WEIGHT_ORDER = (
    "bx_t",
    "w0p_t", "b0",
    "w1_t", "b1", "w2_t", "b2", "w3_t", "b3", "w4_t", "b4",
    "w5p_t", "w5h_t", "b5",
    "w6_t", "b6", "w7_t", "b7",
    "w_alpha_t", "b_alpha", "w_feat_t", "b_feat",
    "wvf_t", "bv",
    "w_rgb_t", "b_rgb",
)


def _mm(w_t, x_t):
    """MXU matmul w_T [M, K] @ x_T [K, Nlanes]: f32 accumulation (Mosaic
    requires a 32-bit acc), rounded to the compute dtype per dot."""
    return jax.lax.dot_general(
        w_t, x_t.astype(w_t.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w_t.dtype)


def _forward(pts3, vcon_ref, ws):
    """The shared PE -> MLP chain: one sample of a ray block.

    Args: pts3 [3, R] raw query coords; vcon_ref [128, R] per-ray view
    contribution; ws the 26 packed weight refs in ``_WEIGHT_ORDER``.
    Returns (rgb [8, R] rows 0:3 live, sigma [8, R] row 0 live), compute
    dtype."""
    (bx_t,
     w0p_t, b0,
     w1_t, b1, w2_t, b2, w3_t, b3, w4_t, b4,
     w5p_t, w5h_t, b5,
     w6_t, b6, w7_t, b7,
     w_alpha_t, b_alpha, w_feat_t, b_feat,
     wvf_t, bv,
     w_rgb_t, b_rgb) = ws

    cdt = w1_t.dtype

    x = pts3.astype(cdt)                             # [3, R]
    xb = _mm(bx_t[:], x)                             # [30, R]
    sx = jnp.sin(xb.astype(jnp.float32)).astype(cdt)
    cx = jnp.cos(xb.astype(jnp.float32)).astype(cdt)
    pe = jnp.concatenate([x, sx, cx], axis=0)        # [63, R]

    h = jnp.maximum(_mm(w0p_t[:], pe) + b0[:], 0.0)  # [256, R]
    h = jnp.maximum(_mm(w1_t[:], h) + b1[:], 0.0)
    h = jnp.maximum(_mm(w2_t[:], h) + b2[:], 0.0)
    h = jnp.maximum(_mm(w3_t[:], h) + b3[:], 0.0)
    h = jnp.maximum(_mm(w4_t[:], h) + b4[:], 0.0)
    h = jnp.maximum(
        _mm(w5p_t[:], pe) + _mm(w5h_t[:], h) + b5[:], 0.0
    )
    h = jnp.maximum(_mm(w6_t[:], h) + b6[:], 0.0)
    h = jnp.maximum(_mm(w7_t[:], h) + b7[:], 0.0)

    sigma = _mm(w_alpha_t[:], h) + b_alpha[:]        # [8, R] (row 0)
    feat = _mm(w_feat_t[:], h) + b_feat[:]           # [256, R]

    # one sample per ray per grid step -> vcon applies directly
    vcon = vcon_ref[:].astype(cdt)                   # [128, R]
    hv = jnp.maximum(_mm(wvf_t[:], feat) + vcon + bv[:], 0.0)
    rgb = _mm(w_rgb_t[:], hv) + b_rgb[:]             # [8, R] (rows 0:3)
    return rgb, sigma


def _kernel(pts_ref, vcon_ref, *refs):
    ws, out_ref = refs[:-1], refs[-1]
    rgb, sigma = _forward(pts_ref[:].reshape(3, -1), vcon_ref, ws)
    out_ref[:] = jnp.concatenate(
        [rgb[:3], sigma[:1]], axis=0
    ).astype(jnp.float32)[None]


@functools.partial(
    jax.jit, static_argnames=("n_samples", "rays_per_block", "interpret")
)
def fused_nerf_raw_t(
    packed,
    pts24_t,
    vcon_t,
    n_samples: int = 8,
    rays_per_block: int = 2048,
    interpret: bool = False,
):
    """Fused PE -> NeRF MLP forward (no AD; inference path).

    The grid is 2-D (ray-block, sample): each step runs ONE sample of
    ``rays_per_block`` rays, so the per-ray view contribution needs no
    in-kernel expansion and every operand keeps rays on the minor (lane)
    axis end to end — no relayout copies on either side (measured: the
    row-major formulation cost ~7 ms/frame in XLA staging).

    Args:
      packed: ``pack_nerf_params`` output.
      pts24_t: [S*3, N] query points, row 3*s + c = coordinate c of
        sample s (build by stacking 1-D per-ray vectors; offsets applied).
      vcon_t: [128, N] per-ray view-direction contribution, transposed:
        ``(d_pe @ views_w[256:]).T`` (bias excluded — added in-kernel).
      n_samples: S (static).

    Returns: raw [N, S, 4] float32 (rgb logits, sigma) — the same contract
    as ``nerf_mlp_apply``, ready for ``ops.composite``.
    """
    S = n_samples
    N = pts24_t.shape[1]
    nb = -(-N // rays_per_block)
    padn = nb * rays_per_block - N
    if padn:
        pts24_t = jnp.pad(pts24_t, ((0, 0), (0, padn)))
        vcon_t = jnp.pad(vcon_t, ((0, 0), (0, padn)))
    Np = nb * rays_per_block
    # [S*3, N] -> [S, 3, N] (same bytes, rays minor) so the per-sample
    # block (1, 3, R) satisfies Mosaic's trailing-dims constraint.
    pts_s3 = pts24_t.reshape(S, 3, Np)

    weights = [packed[k] for k in _WEIGHT_ORDER]
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

    # [S, 4, Np] -> [N, S, 4]; rays stay minor throughout.
    return out.transpose(2, 0, 1)[:N]


def _make_composite_kernel(n_samples: int, white_bkgd: bool):
    def _kernel(pts_ref, vcon_ref, aux_ref, *refs):
        ws = refs[:-3]
        out_ref, w_ref, sig_ref = refs[-3:]
        s = pl.program_id(1)
        rgb8, sigma8 = _forward(pts_ref[:].reshape(3, -1), vcon_ref, ws)
        sigf = sigma8[0:1].astype(jnp.float32)            # [1, R]
        rgbf = jax.nn.sigmoid(rgb8[0:3].astype(jnp.float32))

        aux = aux_ref[:].reshape(4, -1).astype(jnp.float32)
        dist, z, madd, mmul = aux[0:1], aux[1:2], aux[2:3], aux[3:4]
        alpha = 1.0 - jnp.exp(-jnp.maximum(sigf + madd, 0.0) * dist)
        alpha = alpha * jnp.maximum(mmul, 0.0)

        @pl.when(s == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[6:7] = jnp.ones_like(out_ref[6:7])    # transmittance

        trans = out_ref[6:7]
        w = alpha * trans
        out_ref[0:3] = out_ref[0:3] + w * rgbf
        out_ref[3:4] = out_ref[3:4] + w * z
        out_ref[5:6] = out_ref[5:6] + w
        out_ref[6:7] = trans * (1.0 - alpha + 1e-10)
        w_ref[:] = w[None]
        sig_ref[:] = sigf[None]

        @pl.when(s == n_samples - 1)
        def _finalize():
            depth = out_ref[3:4]
            acc = out_ref[5:6]
            out_ref[4:5] = 1.0 / jnp.maximum(1e-10, depth / acc)
            if white_bkgd:
                out_ref[0:3] = out_ref[0:3] + (1.0 - acc)

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_samples", "white_bkgd", "rays_per_block", "interpret"),
)
def fused_nerf_composite_t(
    packed,
    pts24_t,
    vcon_t,
    z_t,
    mm_add_t,
    mm_mul_t,
    dnorm_t,
    n_samples: int = 8,
    white_bkgd: bool = False,
    rays_per_block: int = 2048,
    interpret: bool = False,
):
    """Fused PE -> NeRF MLP -> alpha COMPOSITE (no AD; inference path).

    Same grid/layout as :func:`fused_nerf_raw_t` (one sample per step,
    rays on lanes), but instead of writing raw [N, S, 4] back to HBM and
    compositing in XLA, the kernel streams the composite along the sample
    grid axis: the output block is revisited across the S steps of a ray
    block, accumulating rgb/depth/acc and the running transmittance
    in-VMEM, with the final step computing disparity. Per-sample weights
    and sigma are emitted as secondary outputs so the ``render_rays``
    contract is unchanged. Semantics mirror ``ops.composite`` with
    mm density corrections, no noise/clamp/num_valid (the inference
    variant, ``run_S_eS_eN_alter_trt.py:564-597``).

    Args:
      packed, pts24_t, vcon_t: as :func:`fused_nerf_raw_t`.
      z_t: [S, N] sorted bin-constrained sample depths (z_vals transposed).
      mm_add_t, mm_mul_t: [S, N] sampler density corrections, transposed.
      dnorm_t: [1, N] per-ray ||ndc_d|| interval scale.

    Returns: dict(rgb [N, 3], depth [N], disp [N], acc [N],
      weights [N, S], sigma [N, S]) — float32.
    """
    S = n_samples
    N = pts24_t.shape[1]
    nb = -(-N // rays_per_block)
    padn = nb * rays_per_block - N
    # [S, 4, N] aux rows per sample: scaled interval, depth, mm_add, mm_mul
    dists = jnp.concatenate(
        [z_t[1:] - z_t[:-1], jnp.full_like(z_t[:1], 1e10)], axis=0
    ) * dnorm_t
    aux = jnp.stack([dists, z_t, mm_add_t, mm_mul_t], axis=1)
    if padn:
        pts24_t = jnp.pad(pts24_t, ((0, 0), (0, padn)))
        vcon_t = jnp.pad(vcon_t, ((0, 0), (0, padn)))
        aux = jnp.pad(aux, ((0, 0), (0, 0), (0, padn)))
    Np = nb * rays_per_block
    pts_s3 = pts24_t.reshape(S, 3, Np)

    weights = [packed[k] for k in _WEIGHT_ORDER]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda b, s: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    out, w_out, sig_out = pl.pallas_call(
        _make_composite_kernel(S, white_bkgd),
        grid=(nb, S),
        in_specs=[
            pl.BlockSpec((1, 3, rays_per_block), lambda b, s: (s, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W_HALF, rays_per_block), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, rays_per_block), lambda b, s: (s, 0, b),
                         memory_space=pltpu.VMEM),
        ] + [full(w) for w in weights],
        out_specs=[
            pl.BlockSpec((8, rays_per_block), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
            # [S, 1, Np] so trailing block dims (1, R) equal/divide the
            # array dims (Mosaic tiling rule; interpret mode doesn't check)
            pl.BlockSpec((1, 1, rays_per_block), lambda b, s: (s, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rays_per_block), lambda b, s: (s, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Np), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, Np), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, Np), jnp.float32),
        ],
        interpret=interpret,
    )(pts_s3, vcon_t, aux, *weights)

    return {
        "rgb": out[0:3, :N].T,
        "depth": out[3, :N],
        "disp": out[4, :N],
        "acc": out[5, :N],
        "weights": w_out[:, 0, :N].T,
        "sigma": sig_out[:, 0, :N].T,
    }
