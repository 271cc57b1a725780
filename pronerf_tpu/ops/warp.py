"""Epipolar inverse warping: project candidate sample points into neighboring
source views and fetch bilinearly-interpolated colors.

TPU-first redesign of the reference warp (``inverse_warp.py:515-581``):

- the reference tiles every training image x every sample into a batch and
  runs ``grid_sample`` over ALL views, then gathers the per-ray selected
  neighbors afterwards; here the per-ray neighbor view indices are gathered
  FIRST and only those views are projected/sampled (k_ref/num_neighbor = ~4x
  less work at fern scale);
- ``grid_sample(align_corners=True, padding_mode='zeros')`` with the
  reference's "push out-of-bounds coords to 2.0" trick becomes an explicit
  OOB mask over a 4-corner gather + lerp;
- the per-view projection matrix is pre-fused on the host into
  ``M = F @ [R^T | -R^T t]`` (F = diag(1,-1,-1)) so the in-graph work is one
  einsum + a perspective divide. Note: unlike the reference's fused TRT-path
  matrix (``run_S_eS_eN_alter_trt.py:289-294``, which passes c2w where w2c is
  required), this matches the training warp math exactly, so training and
  inference agree. The perspective divide uses ``|z|`` like the training warp
  (``inverse_warp.py:541-547``), not the signed z of the TRT variant.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fuse_projection(c2w):
    """Per-view fused matrix M = F @ [R^T | -R^T t] with F = diag(1,-1,-1).

    Applying M to homogeneous world points yields p = (c_x, -c_y, -c_z) in
    the source camera frame; pixel coords follow as
    u = fx * p_x / |p_z| + cx, v = fy * p_y / |p_z| + cy, matching the
    training warp's x/|z|, -y/|z| convention for the OpenGL-style camera.

    Args:
      c2w: [..., 3, 4] camera-to-world pose(s).

    Returns: [..., 3, 4].
    """
    c2w = jnp.asarray(c2w)
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    w2c_t = -jnp.einsum("...ij,...j->...i", Rt, t, precision="highest")
    M = jnp.concatenate([Rt, w2c_t[..., None]], axis=-1)
    F = jnp.asarray([1.0, -1.0, -1.0], dtype=M.dtype)
    return M * F[..., :, None]


def project_points(pts, M, K, H: int, W: int, eps: float = 1e-8):
    """Project world points into a source view; return normalized coords.

    Args:
      pts: [..., 3] world points.
      M: [..., 3, 4] fused matrices (see :func:`fuse_projection`),
         broadcastable against pts' batch shape.
      K: [3, 3] shared intrinsics.
      H, W: source image size.

    Returns:
      (xn, yn): [...] coords normalized to [-1, 1] (align_corners mapping);
      values outside [-1, 1] are out of bounds.
    """
    p = jnp.einsum(
        "...ij,...j->...i", M[..., :3], pts, precision="highest"
    ) + M[..., 3]
    z = jnp.abs(p[..., 2]) + eps
    u = K[0, 0] * p[..., 0] / z + K[0, 2]
    v = K[1, 1] * p[..., 1] / z + K[1, 2]
    xn = 2.0 * u / (W - 1) - 1.0
    yn = 2.0 * v / (H - 1) - 1.0
    return xn, yn


def build_corner_stack(images):
    """Precompute the 2x2-neighborhood channel stack for fused bilinear
    gathers: out[..., j, i, :] = concat(img[j, i], img[j, i+1], img[j+1, i],
    img[j+1, i+1]) with edge clamping.

    TPU rationale: XLA's gather emitter pays per-ROW cost, so fetching the
    four bilinear corners as four gathers is ~4x the HBM work of one gather
    of a pre-stacked 12-channel row. Built once per scene (4x image memory).

    Args: images [T, H, W, C]. Returns [T, H, W, 4*C].
    """
    right = jnp.concatenate([images[:, :, 1:], images[:, :, -1:]], axis=2)
    down = jnp.concatenate([images[:, 1:], images[:, -1:]], axis=1)
    diag = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    return jnp.concatenate([images, right, down, diag], axis=-1)


def build_corner_stack_u8(images):
    """Quantized corner stack: the 12 corner channels (2x2 neighborhood x
    RGB, see :func:`build_corner_stack`) packed as THREE int32 words of four
    uint8 lanes each.

    TPU rationale: XLA's gather emitter costs ~constant time per gathered
    ELEMENT (measured: 12 f32 channels/row == 4 x 3 channels/row), so
    packing four 8-bit channels per 32-bit word cuts the dominant epipolar
    fetch 4x. LLFF images are 8-bit sources loaded as u8/255, so the
    round-trip is EXACT for real data (synthetic float scenes quantize to
    1/255 — bounded by half the sensor quantization they emulate).

    Args: images [T, H, W, 3] float in [0, 1].
    Returns: int32 [T, H, W, 3] (word w holds corner-channels 4w..4w+3).
    """
    stack = build_corner_stack(images)  # [T, H, W, 12] = 4 corners x rgb
    q = jnp.clip(jnp.round(stack * 255.0), 0, 255).astype(jnp.uint32)
    # word j (j = r,g,b): byte c holds corner c's channel j, so a single
    # byte-lane extraction of the 3 words yields one corner's rgb.
    words = [
        q[..., 0 * 3 + j]
        | (q[..., 1 * 3 + j] << 8)
        | (q[..., 2 * 3 + j] << 16)
        | (q[..., 3 * 3 + j] << 24)
        for j in range(3)
    ]
    return jnp.stack(words, axis=-1).astype(jnp.int32)


def bilinear_sample_packed_u8(packed, view_idx, xn, yn):
    """Bilinear sample from a :func:`build_corner_stack_u8` array: ONE
    3-element int32 row gather per sample point + VPU unpack."""
    T, H, W, _ = packed.shape
    inb = (xn >= -1.0) & (xn <= 1.0) & (yn >= -1.0) & (yn <= 1.0)
    u = jnp.clip((xn + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    v = jnp.clip((yn + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    wx = (u - x0.astype(u.dtype))[..., None]
    wy = (v - y0.astype(v.dtype))[..., None]

    rows = jnp.take(
        packed.reshape(T * H * W, 3),
        view_idx.astype(jnp.int32) * (H * W) + y0 * W + x0,
        axis=0,
    ).astype(jnp.uint32)  # [..., 3] words

    def lane(shift):
        return ((rows >> shift) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)

    c00, c01, c10, c11 = lane(0), lane(8), lane(16), lane(24)
    top = c00 * (1.0 - wx) + c01 * wx
    bot = c10 * (1.0 - wx) + c11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out * inb[..., None].astype(out.dtype)


def bilinear_sample_packed_u8_split(packed, view_idx, xn, yn):
    """:func:`bilinear_sample_packed_u8` with the [P, 3] row gather split
    into THREE rank-1 word gathers.

    Motivation (v5e, DESIGN.md): the row-gather form keeps the emitter's
    fast path but its [P, 3] int32 result tiles with 3 of 128 lanes used,
    and XLA inserts relayout copies (~17 ms/frame at 1008x756). A rank-1
    [P] result is fully lane-packed — no relayout — at the price of 3x the
    index processing. Results match (bit-identical on CPU; <=3e-7 on TPU
    where fusion reorders the lerp).

    MEASURED NEGATIVE RESULT (v5e, ``scripts/bench_gather_split.py``): the
    emitter's fast path does NOT fire for rank-1 takes — raw split gathers
    ran 6x SLOWER (189 vs 31 ms per 6.1 M indices) and every in-graph
    variant 3-7x slower. The [P, 3] row gather + relayout is the optimum
    XLA currently offers; ``RenderStatics.gather_split`` stays as the
    measured A/B knob (default off).
    """
    T, H, W, _ = packed.shape
    inb = (xn >= -1.0) & (xn <= 1.0) & (yn >= -1.0) & (yn <= 1.0)
    u = jnp.clip((xn + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    v = jnp.clip((yn + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    wx = u - x0.astype(u.dtype)
    wy = v - y0.astype(v.dtype)
    ix = view_idx.astype(jnp.int32) * (H * W) + y0 * W + x0
    flat = packed.reshape(T * H * W, 3)
    inb_f = inb.astype(jnp.float32)
    chans = []
    for k in range(3):
        w = jnp.take(flat[:, k], ix).astype(jnp.uint32)
        # scale-then-lerp in the same order as the row-gather path so the
        # two are bit-identical, not merely close
        c00 = (w & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        c01 = ((w >> 8) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        c10 = ((w >> 16) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        c11 = ((w >> 24) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        top = c00 * (1.0 - wx) + c01 * wx
        bot = c10 * (1.0 - wx) + c11 * wx
        chans.append((top * (1.0 - wy) + bot * wy) * inb_f)
    return jnp.stack(chans, axis=-1)


def build_rgb_word_u8(images):
    """Whole-pixel u8 pack for nearest-neighbor warping: int32 [T, H, W]
    with r | g<<8 | b<<16. ONE gathered element per sample point."""
    q = jnp.clip(jnp.round(images * 255.0), 0, 255).astype(jnp.uint32)
    return (q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)).astype(jnp.int32)


def nearest_sample_packed_u8(packed, view_idx, xn, yn):
    """Nearest-neighbor sample from a :func:`build_rgb_word_u8` array:
    ONE int32 element gathered per point.

    Speed knob (``warp_interp='nearest'``): 3x fewer gathered elements
    than the packed bilinear path, but NOT reference-parity (the reference
    always samples bilinearly); intended for throughput-first serving with
    models trained/fine-tuned under the same sampling.
    """
    T, H, W = packed.shape
    inb = (xn >= -1.0) & (xn <= 1.0) & (yn >= -1.0) & (yn <= 1.0)
    u = jnp.clip((xn + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    v = jnp.clip((yn + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.round(u).astype(jnp.int32)
    y0 = jnp.round(v).astype(jnp.int32)
    words = jnp.take(
        packed.reshape(T * H * W),
        view_idx.astype(jnp.int32) * (H * W) + y0 * W + x0,
    ).astype(jnp.uint32)
    out = jnp.stack(
        [
            (words & 0xFF).astype(jnp.float32),
            ((words >> 8) & 0xFF).astype(jnp.float32),
            ((words >> 16) & 0xFF).astype(jnp.float32),
        ],
        axis=-1,
    ) * (1.0 / 255.0)
    return out * inb[..., None].astype(out.dtype)


def bilinear_sample_packed(corner_stack, view_idx, xn, yn):
    """Bilinear sample from a :func:`build_corner_stack` array with ONE
    row gather per sample point. Semantics identical to
    :func:`bilinear_sample` (align_corners=True, zeros outside [-1, 1])."""
    T, H, W, C4 = corner_stack.shape
    C = C4 // 4
    inb = (xn >= -1.0) & (xn <= 1.0) & (yn >= -1.0) & (yn <= 1.0)
    u = jnp.clip((xn + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    v = jnp.clip((yn + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    wx = (u - x0.astype(u.dtype))[..., None]
    wy = (v - y0.astype(v.dtype))[..., None]

    rows = jnp.take(
        corner_stack.reshape(T * H * W, C4),
        view_idx.astype(jnp.int32) * (H * W) + y0 * W + x0,
        axis=0,
    )
    c00, c01 = rows[..., :C], rows[..., C : 2 * C]
    c10, c11 = rows[..., 2 * C : 3 * C], rows[..., 3 * C :]
    # Edge clamp in the stack already duplicates the border pixel, so the
    # (zero-weighted) out-of-row corner matches bilinear_sample's clip.
    top = c00 * (1.0 - wx) + c01 * wx
    bot = c10 * (1.0 - wx) + c11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out * inb[..., None].astype(out.dtype)


def bilinear_sample(images, view_idx, xn, yn):
    """Bilinear sample with align_corners=True and zeros outside [-1, 1].

    Args:
      images: [T, H, W, C].
      view_idx: [...] int32 view index per sample point.
      xn, yn: [...] normalized coords.

    Returns: [..., C]; exact zeros where (xn, yn) is out of bounds.
    """
    T, H, W, C = images.shape
    inb = (
        (xn >= -1.0) & (xn <= 1.0) & (yn >= -1.0) & (yn <= 1.0)
    )
    u = (xn + 1.0) * 0.5 * (W - 1)
    v = (yn + 1.0) * 0.5 * (H - 1)
    u = jnp.clip(u, 0.0, W - 1)
    v = jnp.clip(v, 0.0, H - 1)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = u - x0.astype(u.dtype)
    wy = v - y0.astype(v.dtype)

    flat = images.reshape(T * H * W, C)
    base = view_idx.astype(jnp.int32) * (H * W)

    def gather(yi, xi):
        return jnp.take(flat, base + yi * W + xi, axis=0)

    c00 = gather(y0, x0)
    c01 = gather(y0, x1)
    c10 = gather(y1, x0)
    c11 = gather(y1, x1)
    top = c00 * (1.0 - wx[..., None]) + c01 * wx[..., None]
    bot = c10 * (1.0 - wx[..., None]) + c11 * wx[..., None]
    out = top * (1.0 - wy[..., None]) + bot * wy[..., None]
    return out * inb[..., None].astype(out.dtype)


def epipolar_colors(images, fused_mats, K, view_idx, rays_o, rays_d, z3d,
                    split: bool = False):
    """Colors of candidate sample points as seen from per-ray neighbor views.

    Args:
      images: [T, H, W, 3] float source images, a [T, H, W, 12]
        :func:`build_corner_stack`, or an int32 [T, H, W, 3]
        :func:`build_corner_stack_u8` (fastest: 3 gathered elements/point).
      fused_mats: [T, 3, 4] per-view fused projection (``fuse_projection``).
      K: [3, 3] shared intrinsics.
      view_idx: [N, V] int neighbor view ids per ray.
      rays_o, rays_d: [N, 3] ORIGINAL camera-space rays (not NDC).
      z3d: [N, S] 3D depths along each ray.

    Returns: colors [N, V, S, 3] (zeros where the projection left the image).
    """
    if images.ndim == 3:
        T, H, W = images.shape
    else:
        T, H, W, C = images.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z3d[..., None]  # [N, S, 3]
    M = fused_mats[view_idx]  # [N, V, 3, 4]
    xn, yn = project_points(pts[:, None, :, :], M[:, :, None, :, :], K, H, W)
    vidx = jnp.broadcast_to(view_idx[:, :, None], xn.shape)
    if images.dtype == jnp.int32 and images.ndim == 3:
        return nearest_sample_packed_u8(images, vidx, xn, yn)
    if images.dtype == jnp.int32 and split:
        return bilinear_sample_packed_u8_split(images, vidx, xn, yn)
    if images.dtype == jnp.int32:
        return bilinear_sample_packed_u8(images, vidx, xn, yn)
    if C == 12:
        return bilinear_sample_packed(images, vidx, xn, yn)
    return bilinear_sample(images, vidx, xn, yn)


# XLA's TPU gather emitter stages tables under roughly this size into fast
# scratch memory and runs ~2-2.5x quicker (measured on v5e,
# ``scripts/bench_gather2.py`` / ``bench_gather_fullres.py``); one 504x378
# u8-packed view (2.29 MB) fits, two do not.
GATHER_CLIFF_BYTES = 2_400_000


def per_view_gather_auto(images) -> bool:
    """Trace-time policy for ``train_gather=-1`` (auto): always the single
    all-views gather.

    The per-view restructure was hypothesised to win at fern scale (17-view
    38.9 MB table above the staging cliff), but the TPU A/B
    (``scripts/bench_gather_train.py``) falsified it: at training index
    volumes (4096 rays x 4 views x 8 samples = 131k indices) the all-views
    warp costs 0.35 ms against 4.7 ms for the per-view loop — the cliff's
    2x per-index rate only matters at serving's millions of indices, while
    the T-fold projection + mask-select overhead is paid regardless. Auto
    therefore never selects per-view; ``train_gather=1`` remains the
    explicit opt-in for re-measurement on other hardware.
    """
    del images
    return False


def epipolar_colors_per_view(images, fused_mats, K, view_idx, rays_o, rays_d,
                             z3d, split: bool = False):
    """Per-ray-view epipolar colors as one SUB-CLIFF gather per training view.

    Numerically identical to :func:`epipolar_colors` (same projections, same
    u8 bilinear unpack), restructured so T gathers of [N, S] points from
    per-view 2.29 MB sub-cliff tables replace one [N, V, S] gather from the
    all-views table (fern scale: 17 views = 38.9 MB); the per-slot colors
    are mask-selected from the matching view's result.

    MEASURED NEGATIVE RESULT (v5e, ``scripts/bench_gather_train.py``): at
    training index volumes this is ~13x SLOWER than the all-views gather
    (4.7 vs 0.35 ms at 4096x4x8) — the above-cliff per-index rate penalty
    is negligible at 131k indices while the T-fold projection + select is
    not. Kept as the ``train_gather=1`` opt-in for re-measurement on other
    hardware; never selected by auto.

    Args:
      images: int32 [T, H, W, 3] ``build_corner_stack_u8`` pack.
      view_idx: [N, V] int per-ray neighbor view ids.
      Other args as :func:`epipolar_colors`.

    Returns: colors [N, V, S, 3].
    """
    import jax

    T, H, W, _ = images.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z3d[..., None]  # [N,S,3]
    zero = jnp.zeros(z3d.shape, jnp.int32)
    out = None
    sample = (bilinear_sample_packed_u8_split if split
              else bilinear_sample_packed_u8)
    for v in range(T):
        img_v = jax.lax.slice_in_dim(images, v, v + 1, axis=0)
        xn, yn = project_points(pts, fused_mats[v], K, H, W)  # [N, S]
        c = sample(img_v, zero, xn, yn)  # [N, S, 3]
        sel = (view_idx == v).astype(c.dtype)  # [N, V]
        contrib = sel[:, :, None, None] * c[:, None, :, :]
        out = contrib if out is None else out + contrib
    return out


def _cast_barrier(c, out_dtype):
    """Serving-path layout-boundary cast (``out_dtype='bfloat16'``).

    The downstream fused kernels consume the epipolar colors transposed
    (rays on lanes), so XLA must relayout the gather results; left alone it
    places that copy on the 12 B/point u32 corner words (measured 32 x
    ~0.5 ms/frame at 1008x756). Casting the lerped colors to bf16 and
    pinning them with an ``optimization_barrier`` moves the layout boundary
    to a 6 B/point tensor — the kernels cast their input to bf16 anyway
    (kernels/fused_minmax.py:112), so valid colors are bit-identical; only
    the mean-fill arithmetic for INVALID projections runs in bf16 (~1 ulp).
    """
    if out_dtype is None:
        return c
    import jax

    return jax.lax.optimization_barrier(c.astype(out_dtype))


def _lerp_t_block(win, idx, wx, wy, hit, out_dtype):
    """One (tile, view) u8-pack bilinear sample emitting the TRANSPOSED
    kernel-consumable block [S*3, nt] — the round-4 serving fast form.

    The [P, 3] u32 row take is the gather emitter's optimum (measured:
    u8/u16/rank-1/split forms 2-27x slower, results/probes_r4_serving.txt),
    but its 3-minor result forces XLA to relayout toward the rays-on-lanes
    fused kernels — 32 x ~0.8 ms/frame of copies at 1008x756 when the
    transition happens at the downstream ``epi_flat.T``. Fusing the
    transpose INTO the lerp's output (reshape [nt, S, 3] -> [nt, S*3],
    then .T) lets XLA emit the transposed bf16 block directly: the probe
    measures take+lerp+finish at 0.89 ms/(tile, view), i.e. the whole
    gather+relayout budget collapses from ~58 ms to ~28 ms per frame.

    Bit-identical per element to :func:`bilinear_sample_packed_u8` (same
    scale-then-lerp order); rows of the block are ordered (s, c) =
    s * 3 + c, matching ``epi_layout='vsc'`` per-view rows.
    """
    import jax

    nt, S = idx.shape
    rows = jnp.take(win, idx, axis=0).astype(jnp.uint32)  # [nt, S, 3]

    def lane(shift):
        return ((rows >> shift) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)

    c00, c01, c10, c11 = lane(0), lane(8), lane(16), lane(24)
    wx = wx[..., None]
    wy = wy[..., None]
    top = c00 * (1.0 - wx) + c01 * wx
    bot = c10 * (1.0 - wx) + c11 * wx
    out = (top * (1.0 - wy) + bot * wy) * hit[..., None].astype(jnp.float32)
    blk = out.reshape(nt, S * 3).T
    if out_dtype is not None:
        blk = blk.astype(out_dtype)
    return jax.lax.optimization_barrier(blk)


def mean_fill_invalid_sct(colors_t, eps: float = 1e-6):
    """(s, c)-row twin of :func:`mean_fill_invalid_t` for the transposed
    gather emit: colors_t [V, S, 3, N] (rays on lanes), validity = channel
    sum > 0 per (view, sample, ray), fill = mean over valid views —
    identical semantics to :func:`mean_fill_invalid`
    (``run_S_eS_eN_alter_base.py:660-662``)."""
    valid = (jnp.sum(colors_t, axis=2, keepdims=True) > 0).astype(
        colors_t.dtype
    )  # [V, S, 1, N]
    mean = jnp.sum(valid * colors_t, axis=0, keepdims=True) / (
        jnp.sum(valid, axis=0, keepdims=True) + eps
    )
    return colors_t * valid + mean * (1.0 - valid)


def epipolar_colors_shared(images, fused_mats, K, view_ids, rays_o, rays_d,
                           z3d, split: bool = False, out_dtype=None,
                           transposed_out: bool = False):
    """Epipolar colors when ALL rays share the same source views (the
    deterministic eval/inference selection, ``run_S_eS_eN_alter_trt.py:281-284``).

    Numerically identical to :func:`epipolar_colors` with a broadcast
    ``view_idx``, but restructured for the TPU gather emitter: each of the V
    views is compacted to its own single-view table (one cheap dynamic
    slice) and gathered independently. Measured on v5e
    (``scripts/bench_gather2.py``): the emitter is ~2.5x faster when the
    gather table fits the small-buffer staging threshold (~2.3 MB = exactly
    one 504x378 packed view; even a 2-view table falls off the cliff), so
    4 single-view gathers of N*S points beat one 4-view gather of N*V*S
    points 16.6 ms vs 31.6 ms at the fern operating point.

    Args:
      images: as :func:`epipolar_colors`.
      view_ids: [V] int32 source-view ids shared by every ray.
      rays_o, rays_d: [N, 3] original camera-space rays.
      z3d: [N, S] 3D depths.
      transposed_out: emit the kernel-consumable transposed layout
        [V, S*3, N] directly (u8-pack bilinear only; see
        :func:`_lerp_t_block`). Bit-identical values to the default form.

    Returns: colors [N, V, S, 3], or [V, S*3, N] when ``transposed_out``.
    """
    import jax

    if images.ndim == 3:
        T, H, W = images.shape
    else:
        T, H, W, C = images.shape
    V = int(view_ids.shape[0])
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z3d[..., None]  # [N, S, 3]
    outs = []
    for v in range(V):
        M = fused_mats[view_ids[v]]  # [3, 4]
        xn, yn = project_points(pts, M, K, H, W)  # [N, S]
        img_v = jax.lax.dynamic_index_in_dim(
            images, view_ids[v], axis=0, keepdims=True
        )  # [1, H, W, ...] single-view table
        if transposed_out:
            assert images.dtype == jnp.int32 and images.ndim == 4 and not split
            inb = (xn >= -1.0) & (xn <= 1.0) & (yn >= -1.0) & (yn <= 1.0)
            u = jnp.clip((xn + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
            vv = jnp.clip((yn + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
            x0 = jnp.floor(u).astype(jnp.int32)
            y0 = jnp.floor(vv).astype(jnp.int32)
            outs.append(_lerp_t_block(
                img_v.reshape(H * W, 3), y0 * W + x0,
                u - x0.astype(u.dtype), vv - y0.astype(vv.dtype), inb,
                out_dtype,
            ))
            continue
        zero = jnp.zeros(xn.shape, jnp.int32)
        if images.dtype == jnp.int32 and images.ndim == 3:
            c = nearest_sample_packed_u8(img_v, zero, xn, yn)
        elif images.dtype == jnp.int32 and split:
            c = bilinear_sample_packed_u8_split(img_v, zero, xn, yn)
        elif images.dtype == jnp.int32:
            c = bilinear_sample_packed_u8(img_v, zero, xn, yn)
        elif C == 12:
            c = bilinear_sample_packed(img_v, zero, xn, yn)
        else:
            c = bilinear_sample(img_v, zero, xn, yn)
        outs.append(_cast_barrier(c, out_dtype))
    if transposed_out:
        return jnp.stack(outs, axis=0)  # [V, S*3, N]
    return jnp.stack(outs, axis=1)


def epipolar_colors_shared_windowed(
    images, fused_mats, K, view_ids, rays_o, rays_d, z3d,
    n_tiles: int, window_rows: int, split: bool = False, out_dtype=None,
    transposed_out: bool = False,
):
    """Shared-view epipolar colors through per-tile SOURCE-ROW WINDOWS —
    the full-resolution serving path.

    Problem (measured, v5e): the XLA gather emitter runs ~2.5x faster when
    the gather table fits the small-buffer staging threshold (~2.3 MB). A
    504x378 packed view fits; the 1008x756 view (9.1 MB) does not, halving
    per-ray throughput at the reference's full-res engine operating point
    (``trt_infer_v2.py:180,344``).

    Fix: rays arrive in target-row-major order, and epipolar geometry keeps
    a contiguous band of target rays projecting into a bounded band of
    source rows (tile rows +- disparity). So: split the ray batch into
    ``n_tiles`` contiguous tiles; per (tile, view), ``dynamic_slice`` a
    ``window_rows``-row band of the packed view around the tile's projected
    row range (a sub-cliff table) and gather from it with band-local
    indices. The corner stack already carries each pixel's right/down
    neighbors, so bilinear sampling from a band slice is EXACT.

    Points whose row lands outside the window (window_rows too small for
    the scene's disparity) are marked invalid exactly like out-of-image
    projections (zeros -> ``mean_fill_invalid``); with a covering window
    the result equals :func:`epipolar_colors_shared` bit for bit (tested).

    Args:
      images: int32 [T, H, W, 3] ``build_corner_stack_u8`` pack (the
        serving format; other formats should use the unwindowed path).
      view_ids: [V] int32 shared source-view ids.
      rays_o, rays_d: [N, 3] original camera-space rays, target-row-major.
      z3d: [N, S] 3D depths.
      n_tiles: contiguous ray tiles (N is padded to a multiple).
      window_rows: source-band height; W * window_rows * 12 B should sit
        under the ~2.3 MB staging threshold.
      transposed_out: emit each (tile, view) block directly in the
        kernel-consumable transposed layout (:func:`_lerp_t_block`) and
        return [V, S*3, N]. Bit-identical values to the default form.

    Returns: colors [N, V, S, 3], or [V, S*3, N] when ``transposed_out``.
    """
    import jax

    T, H, W, _ = images.shape
    V = int(view_ids.shape[0])
    N, S = z3d.shape
    n_pad = -(-N // n_tiles) * n_tiles - N
    if n_pad:
        rays_o = jnp.pad(rays_o, ((0, n_pad), (0, 0)))
        rays_d = jnp.pad(rays_d, ((0, n_pad), (0, 0)), constant_values=1.0)
        z3d = jnp.pad(z3d, ((0, n_pad), (0, 0)))
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z3d[..., None]
    nt = (N + n_pad) // n_tiles
    # zero-padded rays (frame tiling pads with zeros) must not influence
    # window placement — their degenerate projections could pull a tile's
    # row window away from the live rays
    live = (jnp.sum(jnp.abs(rays_d), axis=-1) > 0)[:, None]

    outs = []
    for v in range(V):
        M = fused_mats[view_ids[v]]
        xn, yn = project_points(pts, M, K, H, W)  # [Np, S]
        inb = (xn >= -1.0) & (xn <= 1.0) & (yn >= -1.0) & (yn <= 1.0)
        u = jnp.clip((xn + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
        vv = jnp.clip((yn + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
        x0 = jnp.floor(u).astype(jnp.int32)
        y0 = jnp.floor(vv).astype(jnp.int32)
        wx = (u - x0.astype(u.dtype))[..., None]
        wy = (vv - y0.astype(vv.dtype))[..., None]
        img_v = jax.lax.dynamic_index_in_dim(
            images, view_ids[v], axis=0, keepdims=False
        )  # [H, W, 3]

        wr = min(window_rows, H)
        tile_cols = []
        for t in range(n_tiles):
            sl = slice(t * nt, (t + 1) * nt)
            y0_t = y0[sl]
            inb_t = inb[sl]
            # window start: cover the tile's VALID projected rows; invalid
            # projections are zeroed anyway so they must not widen the
            # band, and neither must zero-PADDED rays (live mask applies
            # here only — folding it into the gather mask measurably
            # perturbed the emitted gather fusion)
            y_lo = jnp.min(jnp.where(inb_t & live[sl], y0_t, H))
            start = jnp.clip(y_lo, 0, max(H - wr, 0))
            win = jax.lax.dynamic_slice(
                img_v, (start, 0, 0), (wr, W, 3)
            ).reshape(-1, 3)
            y_loc = y0_t - start
            hit = inb_t & (y_loc >= 0) & (y_loc < wr)
            idx_t = jnp.clip(y_loc, 0, wr - 1) * W + x0[sl]
            if transposed_out:
                tile_cols.append(_lerp_t_block(
                    win, idx_t, wx[sl][..., 0], wy[sl][..., 0], hit,
                    out_dtype,
                ))
                continue
            if split:
                # three rank-1 word gathers (fully lane-packed results, no
                # [P, 3] relayout) — see bilinear_sample_packed_u8_split
                wxs, wys = wx[sl][..., 0], wy[sl][..., 0]
                hit_f = hit.astype(jnp.float32)
                chans = []
                for k in range(3):
                    w = jnp.take(win[:, k], idx_t).astype(jnp.uint32)
                    c00 = (w & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
                    c01 = ((w >> 8) & 0xFF).astype(jnp.float32) * (
                        1.0 / 255.0)
                    c10 = ((w >> 16) & 0xFF).astype(jnp.float32) * (
                        1.0 / 255.0)
                    c11 = ((w >> 24) & 0xFF).astype(jnp.float32) * (
                        1.0 / 255.0)
                    top = c00 * (1.0 - wxs) + c01 * wxs
                    bot = c10 * (1.0 - wxs) + c11 * wxs
                    chans.append((top * (1.0 - wys) + bot * wys) * hit_f)
                tile_cols.append(
                    _cast_barrier(jnp.stack(chans, axis=-1), out_dtype)
                )
                continue
            rows = jnp.take(win, idx_t, axis=0).astype(jnp.uint32)

            def lane(shift):
                return ((rows >> shift) & 0xFF).astype(jnp.float32) * (
                    1.0 / 255.0
                )

            c00, c01, c10, c11 = lane(0), lane(8), lane(16), lane(24)
            top = c00 * (1.0 - wx[sl]) + c01 * wx[sl]
            bot = c10 * (1.0 - wx[sl]) + c11 * wx[sl]
            out = top * (1.0 - wy[sl]) + bot * wy[sl]
            tile_cols.append(
                _cast_barrier(
                    out * hit[..., None].astype(out.dtype), out_dtype
                )
            )
        outs.append(jnp.concatenate(tile_cols, axis=-1 if transposed_out
                                    else 0))
    if transposed_out:
        return jnp.stack(outs, axis=0)[..., :N]  # [V, S*3, N]
    colors = jnp.stack(outs, axis=1)  # [Np, V, S, 3]
    return colors[:N]


def epipolar_colors_shared_t(
    images, fused_mats, K, view_ids, or_o_t, or_d_t, z3d_t,
    n_tiles: int = 0, window_rows: int = 0,
):
    """Shared-view epipolar colors in the TRANSPOSED serving layout:
    rays on lanes end to end.

    Numerically identical to :func:`epipolar_colors_shared` (same
    projections, same u8 bilinear unpack order — bit-exact per element) and
    to :func:`epipolar_colors_shared_windowed` when ``n_tiles > 0``, but
    every array keeps RAYS ON THE MINOR (lane) AXIS: projections, lerp
    weights and outputs are [S, N] / [3, S, N] panels with full lane
    utilization, where the row-major forms run the same VPU work on
    [P, small] arrays at <= 8/128 lane occupancy. The one layout change the
    gather forces — its fast take-form result is [P, 3] words — is paid
    ONCE, on the u32 words (3x fewer bytes than relayouting the lerped f32
    colors, which is what the row-major pipeline makes XLA do downstream).

    Args:
      images: int32 [T, H, W, 3] ``build_corner_stack_u8`` pack (required).
      view_ids: [V] int32 shared source-view ids.
      or_o_t, or_d_t: [3, N] original camera-space rays, transposed.
      z3d_t: [S, N] 3D depths, transposed.
      n_tiles / window_rows: as :func:`epipolar_colors_shared_windowed`
        (0 = unwindowed). Rays must be target-row-major for windows to
        cover, exactly like the row-major path.

    Returns: colors_t [V, 3, S, N] float32 — reshape to [V*3*S, N] for the
    (v, c, s)-ordered refine-input rows (weight rows permuted to match at
    pack time: ``pack_minmax_params(rest_row_perm=...)``).
    """
    import jax

    T, H, W, _ = images.shape
    V = int(view_ids.shape[0])
    S, N = z3d_t.shape
    if n_tiles and n_tiles > 0:
        n_pad = -(-N // n_tiles) * n_tiles - N
    else:
        n_tiles, n_pad = 0, 0
    if n_pad:
        or_o_t = jnp.pad(or_o_t, ((0, 0), (0, n_pad)))
        or_d_t = jnp.pad(or_d_t, ((0, 0), (0, n_pad)), constant_values=1.0)
        z3d_t = jnp.pad(z3d_t, ((0, 0), (0, n_pad)))
    Np = N + n_pad
    # [3, S, Np] world points: row (c, s) = o_c + d_c * z_s
    pts = or_o_t[:, None, :] + or_d_t[:, None, :] * z3d_t[None, :, :]
    # zero-padded rays must not influence window placement (see the
    # row-major path)
    live = (jnp.sum(jnp.abs(or_d_t), axis=0) > 0)[None, :]  # [1, Np]

    outs = []
    for v in range(V):
        M = fused_mats[view_ids[v]]  # [3, 4]
        # Unrolled scalar-broadcast projection (NOT an einsum/dot: a [3, 3]
        # x [3, S*N] contraction in f32-highest lowers to serial while
        # loops on TPU — measured 0.34 ms EACH, 14 per frame at 504x378 —
        # while scalar multiply-adds fuse into the surrounding elementwise
        # graph exactly like the row-major path's per-point einsum does)
        p = [
            M[i, 0] * pts[0] + M[i, 1] * pts[1] + M[i, 2] * pts[2] + M[i, 3]
            for i in range(3)
        ]  # each [S, Np]
        z = jnp.abs(p[2]) + 1e-8
        u_pix = K[0, 0] * p[0] / z + K[0, 2]
        v_pix = K[1, 1] * p[1] / z + K[1, 2]
        xn = 2.0 * u_pix / (W - 1) - 1.0
        yn = 2.0 * v_pix / (H - 1) - 1.0
        inb = (xn >= -1.0) & (xn <= 1.0) & (yn >= -1.0) & (yn <= 1.0)
        u = jnp.clip((xn + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
        vv = jnp.clip((yn + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
        x0 = jnp.floor(u).astype(jnp.int32)
        y0 = jnp.floor(vv).astype(jnp.int32)
        wx = u - x0.astype(u.dtype)   # [S, Np]
        wy = vv - y0.astype(vv.dtype)
        img_v = jax.lax.dynamic_index_in_dim(
            images, view_ids[v], axis=0, keepdims=False
        )  # [H, W, 3]

        def lerp(rows_t, wx_, wy_, hit_):
            # rows_t [3, S, n] uint32; identical scale-then-lerp order as
            # bilinear_sample_packed_u8 so the two paths are bit-identical
            def lane(shift):
                return ((rows_t >> shift) & 0xFF).astype(jnp.float32) * (
                    1.0 / 255.0
                )

            c00, c01, c10, c11 = lane(0), lane(8), lane(16), lane(24)
            top = c00 * (1.0 - wx_[None]) + c01 * wx_[None]
            bot = c10 * (1.0 - wx_[None]) + c11 * wx_[None]
            out = top * (1.0 - wy_[None]) + bot * wy_[None]
            return out * hit_[None].astype(out.dtype)

        if not n_tiles:
            idx = (y0 * W + x0).reshape(-1)  # [S*Np], s-major
            rows = jnp.take(img_v.reshape(H * W, 3), idx, axis=0)
            rows_t = rows.T.astype(jnp.uint32).reshape(3, S, Np)
            outs.append(lerp(rows_t, wx, wy, inb))
            continue

        wr = min(window_rows, H)
        nt = Np // n_tiles
        tile_cols = []
        for t in range(n_tiles):
            sl = slice(t * nt, (t + 1) * nt)
            y0_t = y0[:, sl]
            inb_t = inb[:, sl]
            y_lo = jnp.min(jnp.where(inb_t & live[:, sl], y0_t, H))
            start = jnp.clip(y_lo, 0, max(H - wr, 0))
            win = jax.lax.dynamic_slice(
                img_v, (start, 0, 0), (wr, W, 3)
            ).reshape(-1, 3)
            y_loc = y0_t - start
            hit = inb_t & (y_loc >= 0) & (y_loc < wr)
            idx_t = (jnp.clip(y_loc, 0, wr - 1) * W + x0[:, sl]).reshape(-1)
            rows = jnp.take(win, idx_t, axis=0)  # [S*nt, 3]
            rows_t = rows.T.astype(jnp.uint32).reshape(3, S, nt)
            tile_cols.append(lerp(rows_t, wx[:, sl], wy[:, sl], hit))
        outs.append(jnp.concatenate(tile_cols, axis=-1))
    colors_t = jnp.stack(outs, axis=0)  # [V, 3, S, Np]
    return colors_t[..., :N]


def mean_fill_invalid_t(colors_t, eps: float = 1e-6):
    """Transposed twin of :func:`mean_fill_invalid`: colors_t [V, 3, S, N]
    (rays on lanes), validity = channel sum > 0 per (view, sample, ray)."""
    valid = (jnp.sum(colors_t, axis=1, keepdims=True) > 0).astype(
        colors_t.dtype
    )  # [V, 1, S, N]
    mean = jnp.sum(valid * colors_t, axis=0, keepdims=True) / (
        jnp.sum(valid, axis=0, keepdims=True) + eps
    )
    return colors_t * valid + mean * (1.0 - valid)


def mean_fill_invalid(colors, eps: float = 1e-6):
    """Replace invalid (all-zero) warped colors by the mean of the valid
    neighbor views at the same (ray, sample), matching the reference's
    fill rule (``run_S_eS_eN_alter_base.py:660-662``): a warp is "valid"
    iff its channel sum is > 0.

    Args:
      colors: [N, V, S, 3].

    Returns: [N, V, S, 3].
    """
    valid = (jnp.sum(colors, axis=-1, keepdims=True) > 0).astype(colors.dtype)
    mean = jnp.sum(valid * colors, axis=1, keepdims=True) / (
        jnp.sum(valid, axis=1, keepdims=True) + eps
    )
    return colors * valid + mean * (1.0 - valid)


def fuse_projection_np(c2w):
    """NumPy twin of :func:`fuse_projection` for host-side precompute."""
    c2w = np.asarray(c2w)
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    Rt = np.swapaxes(R, -1, -2)
    w2c_t = -np.einsum("...ij,...j->...i", Rt, t)
    M = np.concatenate([Rt, w2c_t[..., None]], axis=-1)
    F = np.asarray([1.0, -1.0, -1.0], dtype=M.dtype)
    return M * F[..., :, None]
