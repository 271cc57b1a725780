"""The serving render pipeline in fully TRANSPOSED layout: rays on lanes,
samples/features on sublanes, end to end.

Why: the row-major serving pipeline (``models/pronerf.py:render_rays`` with
``use_pallas``) already runs the three MLPs as transposed Pallas kernels,
but everything BETWEEN them — sampler-head splits, the 8-depth sort,
NDC->3D, per-view projections, bilinear lerp weights, the valid-mean fill,
bin constraints — operates on [N, 8]/[N, V, S, 3]-shaped arrays whose minor
(lane) axis is 8 or 3 of 128 lanes, and the kernel boundaries force XLA to
insert large relayout copies ([N, 96] -> [96, N] refine input is 293 MB at
1008x756; the raw [N, S, 4] NeRF output another 390 MB). Here every
intermediate keeps rays minor:

- the sampler/refine kernels return their native [out_rows, N] panels
  (``fused_minmax_t(transpose_out=False)``) and heads are ROW slices;
- the depth sort runs along sublanes (``lax.sort(dimension=0)``);
- the epipolar gather keeps its fast take-form [P, 3] row fetch but pays
  the ONE forced relayout on the u32 words — 3x fewer bytes than the f32
  colors the row-major pipeline relayouts — and emits (v, c, s)-ordered
  feature rows directly; the refine first-layer weight rows are permuted
  to match at pack time (``pack_minmax_params(rest_row_perm=...)``);
- compositing streams inside the fused NeRF kernel
  (``fused_nerf_composite_t``), whose [S, N] aux inputs are now native —
  no raw [N, S, 4] is ever materialized.

Semantics: EXACTLY the deterministic inference branch
(``RenderStatics.infer``; reference ``run_S_eS_eN_alter_trt.py:599-696``)
— shared nearest views, mm density corrections always, no noise/clamp/
jitter. Training and the parity paths keep ``render_rays``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pronerf_tpu.models.pronerf import RenderStatics, _nearest_views
from pronerf_tpu.ops.encoding import positional_encoding
from pronerf_tpu.ops.sampling import ndc_to_3d_depth
from pronerf_tpu.ops.warp import (
    epipolar_colors_shared_t,
    mean_fill_invalid_t,
)


def transposed_eligible(statics: RenderStatics, images) -> bool:
    """True when ``render_rays_t`` implements these statics exactly: the
    deterministic Pallas serving branch over a u8-packed scene."""
    return (
        statics.use_pallas
        and not statics.randomize
        and not statics.explore
        and not statics.jitter
        and statics.use_mm
        and not statics.clamp_raw
        and statics.noise_std == 0.0
        and statics.add_offsets
        and statics.epi_layout == "vsc"
        and not statics.mmnetskips
        and statics.netarch == "nerf"
        and images.ndim == 4
        and images.dtype == jnp.int32
    )


def refine_rest_row_perm(num_neighbor: int, n_samples: int):
    """Permutation mapping the transposed pipeline's (v, c, s) epipolar
    feature rows onto the reference refine-net's (v, s, c) input rows."""
    return [
        v * n_samples * 3 + s * 3 + c
        for v in range(num_neighbor)
        for c in range(3)
        for s in range(n_samples)
    ]


def _bin_constrain_t(depths_sorted, refine_sig, near, far):
    """Axis-0 twin of ``ops.sampling.bin_constrain`` ([S, N] panels)."""
    mids = 0.5 * (depths_sorted[1:] + depths_sorted[:-1])
    upper = jnp.concatenate([mids, 0.5 * (far + depths_sorted[-1:])], axis=0)
    lower = jnp.concatenate([0.5 * (near + depths_sorted[:1]), mids], axis=0)
    return lower + (upper - lower) * refine_sig


def _plucker_t(o_t, d_t):
    """[6, N] Pluecker signature [d_hat, o x d_hat] from [3, N] rows
    (twin of ``ops.encoding.plucker`` on the ray origin)."""
    n = jnp.sqrt(jnp.sum(d_t * d_t, axis=0, keepdims=True))
    dh = d_t / jnp.clip(n, 1e-12, None)
    m = jnp.stack(
        [
            o_t[1] * dh[2] - o_t[2] * dh[1],
            o_t[2] * dh[0] - o_t[0] * dh[2],
            o_t[0] * dh[1] - o_t[1] * dh[0],
        ],
        axis=0,
    )
    return jnp.concatenate([dh, m], axis=0)


def render_rays_t(params, rays, scene, controls, statics: RenderStatics):
    """Transposed-serving twin of ``models.pronerf.render_rays``.

    Same (params, rays, scene, controls) contract and the same output dict;
    numerics match the row-major serving graph (kernel math is identical;
    the refine matmul sums its input rows in a permuted order, a bounded
    float reassociation).
    """
    from pronerf_tpu.kernels.fused_minmax import (
        fused_minmax_t,
        pack_minmax_params,
    )
    from pronerf_tpu.kernels.fused_nerf import (
        fused_nerf_composite_t,
        pack_nerf_params,
    )

    S = statics.N_samples
    V = statics.num_neighbor
    near, far = statics.near, statics.far
    cdt = jnp.bfloat16 if statics.compute_dtype == "bfloat16" else None
    kdt = jnp.bfloat16 if cdt is not None else jnp.float32
    interp = jax.default_backend() != "tpu"
    blk = statics.pallas_block_rays

    ndc_o_t = rays["ndc_o"].T  # [3, N]
    ndc_d_t = rays["ndc_d"].T
    or_o_t = rays["or_o"].T
    or_d_t = rays["or_d"].T
    n_rays = ndc_o_t.shape[1]

    # 1. Sampler on the folded Pluecker signature (collinearity fold: the
    # 48-point signature is 48 copies of one 6-vector).
    sig_t = _plucker_t(ndc_o_t, ndc_d_t)  # [6, N]
    packed_s = params.get("sampler_packed")
    if packed_s is None:
        packed_s = pack_minmax_params(
            params["sampler"], statics.N_point_ray_enc, kdt
        )
    mm_out = fused_minmax_t(
        packed_s, sig_t, rays_per_block=blk, interpret=interp,
        transpose_out=False,
    )  # [out_pad, N]; heads are ROW slices
    mm_rgb_t = jax.nn.sigmoid(mm_out[3 * S: 3 * S + 3])  # [3, N]
    depth_t = jax.nn.sigmoid(mm_out[:S]) * (far - near) + near  # [S, N]
    mm_add_t = mm_out[S: 2 * S]
    mm_mul_t = mm_out[2 * S: 3 * S]

    # 2. Sort depths along the sample (sublane) axis, payloads riding the
    # same compare/select network.
    depth_t, mm_add_t, mm_mul_t = jax.lax.sort(
        (depth_t, mm_add_t, mm_mul_t), dimension=0, num_keys=1
    )
    z3d_t = ndc_to_3d_depth(depth_t, statics.ndc_eps)

    # 3. Shared-view epipolar gather, transposed; (v, c, s) feature rows.
    nearest = _nearest_views(statics, scene, controls)
    colors_t = epipolar_colors_shared_t(
        scene["images"], scene["fused_mats"], scene["K"], nearest,
        or_o_t, or_d_t, jax.lax.stop_gradient(z3d_t),
        n_tiles=max(statics.gather_tiles, 0),
        window_rows=statics.gather_window_rows,
    )  # [V, 3, S, N]
    colors_t = mean_fill_invalid_t(colors_t)
    epi_t = jax.lax.stop_gradient(colors_t).reshape(V * 3 * S, n_rays)

    # 4. Refine net; first-layer rows permuted to the (v, c, s) order.
    packed_r = params.get("refine_packed_t")
    if packed_r is None:
        packed_r = pack_minmax_params(
            params["refine"], S, kdt,
            rest_row_perm=refine_rest_row_perm(V, S),
        )
    refine_out = fused_minmax_t(
        packed_r, jnp.concatenate([sig_t, epi_t], axis=0),
        rays_per_block=blk, interpret=interp, transpose_out=False,
    )  # [out_pad, N]
    refine_sig_t = jax.nn.sigmoid(refine_out[:S])       # [S, N]
    refine_rgb_t = jax.nn.sigmoid(refine_out[4 * S: 4 * S + 3])  # [3, N]
    po_rows = refine_out[S: 4 * S]  # [3S, N], row 3 s + c

    # 5. Bin-constrained depths; query points as (s, c) rows with the
    # tanh offsets applied row-wise (no [N, S, 3] intermediate).
    z_vals_t = _bin_constrain_t(depth_t, refine_sig_t, near, far)  # [S, N]
    pts24_t = (
        jnp.tile(ndc_o_t, (S, 1))
        + jnp.repeat(z_vals_t, 3, axis=0) * jnp.tile(ndc_d_t, (S, 1))
        + statics.offset_scale * jnp.tanh(po_rows)
    )  # [S*3, N]

    # 6. Fused NeRF + streaming composite (inference semantics; the [S, N]
    # aux inputs are native here — no transposes, no raw materialization).
    packed_n = params.get("nerf_packed")
    if packed_n is None:
        packed_n = pack_nerf_params(params["nerf"], kdt)
    d_pe = positional_encoding(rays["viewdirs"], statics.multires_views)
    wv = params["nerf"]["views"]["w"]
    vcon_t = jax.lax.dot_general(
        wv[wv.shape[0] - d_pe.shape[-1]:].astype(kdt), d_pe.astype(kdt),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [128, N]
    dnorm_t = jnp.sqrt(jnp.sum(ndc_d_t * ndc_d_t, axis=0))[None]  # [1, N]
    comp = fused_nerf_composite_t(
        packed_n, pts24_t, vcon_t,
        z_vals_t.astype(jnp.float32),
        mm_add_t.astype(jnp.float32),
        mm_mul_t.astype(jnp.float32),
        dnorm_t.astype(jnp.float32),
        n_samples=S, white_bkgd=statics.white_bkgd,
        rays_per_block=blk, interpret=interp,
    )
    return {
        "rgb0": refine_rgb_t.T,
        "rgb1": comp["rgb"],
        "depth": comp["depth"],
        "disp": comp["disp"],
        "acc": comp["acc"],
        "weights": comp["weights"],
        "mm_rgb": mm_rgb_t.T,
        "depth0": jnp.mean(jax.lax.stop_gradient(z_vals_t), axis=0),
        "sigma": comp["sigma"],
    }
