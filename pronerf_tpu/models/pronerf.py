"""The full ProNeRF render pipeline as ONE pure, shape-static function.

Pipeline per ray batch (SURVEY.md §3.1):
  1. Pluecker-encode 48 fixed NDC points -> sampler MLP -> 8 candidate depths
     (sigmoid into [near, far]) + density corrections + auxiliary RGB;
  2. sort depths (payload-gathering the corrections), map NDC depth to 3D;
  3. select per-ray neighbor source views, project the 8 candidates into them
     (epipolar warp, always non-differentiable), mean-fill invalid colors;
  4. refine MLP on [Pluecker(8 pts) || warped colors] -> refined depths
     (constrained to per-sample bins), 3D point offsets, auxiliary RGB;
  5. branch-specific sample surgery (stage-1 exploration expansion, stage-2
     jitter, learned offsets);
  6. NeRF MLP on positionally-encoded points/dirs -> alpha compositing with
     the sampler's density corrections folded in when enabled.

All data-dependent behavior of the reference (n_mult sample multiplication,
direction coins, neighbor subsets) enters as traced scalars/arrays so a
single XLA graph per (stage, branch) covers every step. Gradation gating
(`torch.no_grad`) becomes `jax.lax.stop_gradient`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from pronerf_tpu.models.mlp import (
    init_minmax_mlp,
    init_nerf_mlp,
    minmax_mlp_apply,
    minmax_mlp_apply_folded,
    nerf_mlp_apply,
)
from pronerf_tpu.ops.composite import composite
from pronerf_tpu.ops.encoding import plucker, posenc_dim, positional_encoding
from pronerf_tpu.ops.rays import linspace_depths, ray_points
from pronerf_tpu.ops.sampling import (
    bin_constrain,
    explore_expand,
    gap_jitter,
    ndc_to_3d_depth,
    sort_with_payloads,
)
from pronerf_tpu.ops.warp import (
    epipolar_colors,
    epipolar_colors_shared,
    mean_fill_invalid,
    per_view_gather_auto,
)


@dataclasses.dataclass(frozen=True)
class RenderStatics:
    """Hashable compile-time configuration of one render graph.

    Factory helpers below derive the reference's (stage, branch) behavior
    matrix; every epsilon that differs between stages is explicit.
    """

    N_samples: int = 8
    N_point_ray_enc: int = 48
    num_neighbor: int = 4
    multires: int = 10
    multires_views: int = 4
    netskips: tuple = (4,)
    mmnetskips: tuple = ()
    near: float = 1e-6
    far: float = 1.0
    ndc_eps: float = 1e-6           # NDC->3D depth epsilon (1e-6 s1, 1e-5 s2)
    epi_layout: str = "svc"          # refine-input color order: s1 [s,v,c], s2 [v,s,c]
    randomize: bool = True           # training-style neighbor choice + noise
    stop_sampler_grad: bool = False  # stage-1 NeRF branch: sampler/refine frozen
    explore: bool = False            # stage-1 NeRF branch sample multiplication
    jitter: bool = False             # stage-2 single-sided jitter
    add_offsets: bool = True         # +1e-2 * tanh offsets on query points
    use_mm: bool = True              # density corrections in compositing
    clamp_raw: bool = False          # stage-1 +-10 raw clamp
    noise_std: float = 0.0           # sigma noise std (stage-dependent)
    white_bkgd: bool = False
    max_expand: int = 64
    offset_scale: float = 1e-2
    compute_dtype: Optional[str] = None  # 'bfloat16' for the inference path
    use_pallas: bool = False  # fused PE->NeRF->composite kernel (inference)
    fuse_composite: bool = False  # stream alpha compositing inside the
                                  # Pallas kernel. Measured cost-NEUTRAL
                                  # standalone but +0.7 ms in-frame on v5e
                                  # (the separate XLA composite fuses with
                                  # neighbors; the kernel's aux inputs and
                                  # secondary outputs do not) — off by
                                  # default, kept as an A/B knob
    pallas_block_rays: int = 4096  # ray columns per fused-kernel grid step
                                   # (one sample per step; 4096 lanes beat
                                   # 2048 by ~1 ms/frame at fern scale in
                                   # the round-3 block sweep on v5e)
    gather_tiles: int = 0      # windowed epipolar gather: contiguous ray
                               # tiles (0 = off; -1 = auto from H*W at
                               # renderer build). Full-res serving path.
    gather_window_rows: int = 0  # source-row band height per tile window
    gather_bf16: int = -1  # cast + barrier the deterministic-path epipolar
                           # colors to bf16 at the gather (moves the
                           # rays-on-lanes layout boundary from 12 B/point
                           # u32 words to 6 B/point colors; the fused
                           # kernels cast input to bf16 anyway). -1 auto
                           # (= on when the fused MinMax kernels serve),
                           # 0 off, 1 force. ROW-MAJOR deterministic graph
                           # only: the transposed pipeline
                           # (``transposed=True``) emits its own layout and
                           # ignores this knob entirely.
    gather_split: bool = False  # serving u8 gathers as three rank-1 word
                                # takes (no [P, 3] relayout) instead of one
                                # [P, 3] row take. MEASURED 3-7x SLOWER on
                                # v5e (the fast gather path only fires for
                                # row takes; scripts/bench_gather_split.py)
                                # — kept as the documented A/B knob
    gather_transposed: int = -1  # deterministic-path epipolar colors emit
                                 # directly in the transposed kernel layout
                                 # [V*S*3, N] with the transpose fused into
                                 # the lerp (ops/warp.py:_lerp_t_block).
                                 # MEASURED NEGATIVE RESULT on v5e
                                 # (results/probes_r4_t_emit.txt): 138.3 vs
                                 # 134.7 ms at 1008x756, 30.0 vs 29.6 at
                                 # 504x378 — the gather fusion still
                                 # materializes [P, 3] s32 in its ~42x
                                 # lane-padded layout and XLA re-inserts
                                 # the same relayout copies (profile:
                                 # probes_r4_profile_temit_fullres.txt);
                                 # axis-1 takes from a [3, rows] table are
                                 # 2.6x slower (probes_r4_axis1_gather.txt)
                                 # so the layout cannot be fixed at birth
                                 # either. -1 auto (= off, row-major
                                 # graph), 0 off, 1 force (A/B knob).
                                 # Bit-identical valid colors either way
    train_gather: int = -1     # training-path per-ray warp: -1 auto
                               # (= all-views gather: the per-view sub-cliff
                               # form MEASURED 13x slower at training index
                               # volumes, scripts/bench_gather_train.py),
                               # 0 all-views, 1 force per-view (A/B knob).
                               # Exactness-equal paths.
    netarch: str = "nerf"     # radiance-field family: 'nerf' | 'donerf'
    transposed: bool = False  # serving pipeline in fully transposed layout
                              # (rays on lanes end to end; models/pronerf_t
                              # .py) — applies to the deterministic Pallas
                              # branch over u8-packed scenes; other configs
                              # fall back to the row-major graph
    quant: str = "none"       # 'int8': run the fused NeRF kernel with int8
                              # MXU matmuls (kernels/fused_nerf_q.py) —
                              # calibrated post-training quantization of
                              # the hidden layers + heads; PE stays bf16.
                              # Serving-only opt-in (requires use_pallas)

    # -- factories reproducing the reference's behavior matrix ------------
    @staticmethod
    def stage1_nerf(randomize=True, noise_std=1.0, **kw) -> "RenderStatics":
        """Stage-1 odd steps: train the NeRF with exploration; sampler and
        refine nets run frozen, density corrections OFF
        (``run_S_eS_eN_alter_base.py:929-940``)."""
        return RenderStatics(
            near=1e-6, ndc_eps=1e-6, epi_layout="svc", randomize=randomize,
            stop_sampler_grad=True, explore=randomize, add_offsets=False,
            use_mm=False, clamp_raw=True,
            noise_std=noise_std if randomize else 0.0, **kw,
        )

    @staticmethod
    def stage1_sampler(randomize=True, **kw) -> "RenderStatics":
        """Stage-1 even steps (and stage-1 eval with randomize=False): all
        nets live, offsets on, density corrections in compositing, no noise
        (``run_S_eS_eN_alter_base.py:941-958``)."""
        return RenderStatics(
            near=1e-6, ndc_eps=1e-6, epi_layout="svc", randomize=randomize,
            stop_sampler_grad=False, explore=False, add_offsets=True,
            use_mm=True, clamp_raw=True, noise_std=0.0, **kw,
        )

    @staticmethod
    def stage2(randomize=True, noise_std=1.0, **kw) -> "RenderStatics":
        """Stage-2 joint training / eval: near=0, eps=1e-5, [v,s,c] feature
        layout, jitter+noise only while training, no raw clamp
        (``run_S_eS_eN_alter_base_refine2.py:525-680``)."""
        return RenderStatics(
            near=0.0, ndc_eps=1e-5, epi_layout="vsc", randomize=randomize,
            stop_sampler_grad=False, explore=False, jitter=randomize,
            add_offsets=True, use_mm=True, clamp_raw=False,
            noise_std=noise_std if randomize else 0.0, **kw,
        )

    @staticmethod
    def infer(
        compute_dtype: Optional[str] = None,
        use_pallas: bool = False,
        **kw,
    ) -> "RenderStatics":
        """Deterministic inference (the reference's TRT-path semantics,
        ``run_S_eS_eN_alter_trt.py:599-696``), optionally in bfloat16 and/or
        through the fused Pallas NeRF+composite kernel."""
        return RenderStatics(
            near=0.0, ndc_eps=1e-5, epi_layout="vsc", randomize=False,
            stop_sampler_grad=False, explore=False, jitter=False,
            add_offsets=True, use_mm=True, clamp_raw=False, noise_std=0.0,
            compute_dtype=compute_dtype, use_pallas=use_pallas, **kw,
        )


def init_pronerf_params(
    key,
    *,
    netarch: str = "nerf",
    netdepth: int = 8,
    netwidth: int = 256,
    mmnetdepth: int = 6,
    mmnetwidth: int = 256,
    N_samples: int = 8,
    N_point_ray_enc: int = 48,
    num_neighbor: int = 4,
    multires: int = 10,
    multires_views: int = 4,
    netskips=(4,),
    mmnetskips=(),
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Initialize the three-net parameter pytree.

    Head widths follow the reference: sampler in=6*48=288 out=3*S+3=27;
    refine in=6*S + 3*V*S=144 out=4*S+3=35
    (``run_S_eS_eN_alter_base.py:394-418``).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    input_ch = posenc_dim(3, multires)
    input_ch_views = posenc_dim(3, multires_views)
    if netarch == "donerf":
        from pronerf_tpu.models.donerf import init_donerf

        nerf = init_donerf(
            k1, netdepth, netwidth, input_ch, input_ch_views, 4, dtype=dtype
        )
    else:
        nerf = init_nerf_mlp(
            k1, netdepth, netwidth, input_ch, input_ch_views, tuple(netskips), dtype
        )
    return {
        "nerf": nerf,
        "sampler": init_minmax_mlp(
            k2, mmnetdepth, mmnetwidth, 6 * N_point_ray_enc,
            3 * N_samples + 3, tuple(mmnetskips), dtype,
        ),
        "refine": init_minmax_mlp(
            k3, mmnetdepth, mmnetwidth,
            6 * N_samples + 3 * num_neighbor * N_samples,
            4 * N_samples + 3, tuple(mmnetskips), dtype,
        ),
    }


def _select_neighbors(statics, rays, scene, controls):
    """Per-ray neighbor source-view ids.

    Training: per-ray sorted-by-camera-distance list excluding the ray's own
    view, indexed by a host-drawn random position subset (shared across the
    batch, ``run_S_eS_eN_alter_base.py:629-634``). Eval: the num_neighbor
    nearest training views to the target pose.
    """
    poses_t = scene["poses_t"]  # [T, 3] training-pose translations
    if statics.randomize:
        target_t = poses_t[rays["pose_id"]]  # [N, 3]
        dist = jnp.linalg.norm(target_t[:, None, :] - poses_t[None], axis=-1)
        # Exclude the ray's own view BY INDEX (send it to +inf -> last in
        # the sort) rather than assuming it wins the distance-0 tie at
        # argsort position 0, which the reference does
        # (``run_S_eS_eN_alter_base.py:627-634``) and which silently breaks
        # when two training poses coincide.
        own = jnp.arange(poses_t.shape[0])[None, :] == rays["pose_id"][:, None]
        dist = jnp.where(own, jnp.inf, dist)
        order = jnp.argsort(dist, axis=-1)  # [N, T]; self is now last
        candidates = order[:, :-1]
        return jnp.take_along_axis(
            candidates,
            jnp.broadcast_to(
                controls["neighbor_subset"][None, :], (dist.shape[0],
                                                       statics.num_neighbor)
            ),
            axis=-1,
        )
    n = rays["ndc_o"].shape[0]
    nearest = _nearest_views(statics, scene, controls)
    return jnp.broadcast_to(nearest[None, :], (n, statics.num_neighbor))


def _nearest_views(statics, scene, controls):
    """[V] nearest training views to the eval/inference target pose —
    shared by every ray of the frame (``run_S_eS_eN_alter_trt.py:281-284``)."""
    dist = jnp.linalg.norm(
        controls["target_t"][None, :] - scene["poses_t"], axis=-1
    )
    return jnp.argsort(dist)[: statics.num_neighbor]


def render_rays(params, rays, scene, controls, statics: RenderStatics):
    """Render a batch of rays end to end.

    Args:
      params: {'nerf', 'sampler', 'refine'} parameter pytree.
      rays: dict of [N, ...] arrays: ndc_o, ndc_d, viewdirs (unit world
        dirs), or_o, or_d (original camera-space rays for warping), and
        pose_id ([N] int32 train-view id; only used when randomize).
      scene: dict: images [T, H, W, 3], fused_mats [T, 3, 4], K [3, 3],
        poses_t [T, 3].
      controls: dict of traced scalars/arrays: rng (PRNGKey), n_mult (int32),
        dir_expand, dir_jitter (bool), neighbor_subset [V] int32 (training),
        target_t [3] (eval).
      statics: RenderStatics (hashable; use as a jit static argument).

    Returns: dict with rgb0 (refine aux rgb), rgb1 (composited NeRF rgb),
      depth, disp, acc, mm_rgb, depth0, weights, sigma.
    """
    S = statics.N_samples
    near, far = statics.near, statics.far
    cdt = jnp.bfloat16 if statics.compute_dtype == "bfloat16" else None

    ndc_o, ndc_d = rays["ndc_o"], rays["ndc_d"]
    n_rays = ndc_o.shape[0]

    # 1. Sampler: Pluecker signature of 48 fixed NDC points.
    # The Pluecker moment m = p x d_hat is invariant along the ray
    # (p = o + t d), so the 48-point signature is 48 copies of one
    # [d_hat, m] 6-vector; the serving path folds the tiling into the
    # first-layer weights instead of materializing [N, 288].
    fold_mm = cdt is not None and not statics.mmnetskips
    mm_kernel = fold_mm and statics.use_pallas
    if mm_kernel:
        from pronerf_tpu.kernels.fused_minmax import (
            fused_minmax_t,
            pack_minmax_params,
        )

        kdt_mm = jnp.bfloat16 if cdt is not None else jnp.float32
        interp = jax.default_backend() != "tpu"
        sig = plucker(ndc_o, ndc_d)  # [N, 6]
        sig_t = sig.T
        packed_s = params.get("sampler_packed")
        if packed_s is None:
            packed_s = pack_minmax_params(
                params["sampler"], statics.N_point_ray_enc, kdt_mm
            )
        mm_out = fused_minmax_t(
            packed_s, sig_t, rays_per_block=statics.pallas_block_rays,
            interpret=interp,
        )[:, : 3 * S + 3]
    elif fold_mm:
        sig = plucker(ndc_o, ndc_d)  # [N, 6]
        mm_out = minmax_mlp_apply_folded(
            params["sampler"], sig, statics.N_point_ray_enc, None, cdt
        )
    else:
        sig_depths = linspace_depths(
            0.0, 1.0, statics.N_point_ray_enc, ndc_o.dtype
        )
        sig_pts = ray_points(
            ndc_o, ndc_d,
            jnp.broadcast_to(sig_depths, (n_rays, statics.N_point_ray_enc)),
        )
        sampler_in = plucker(sig_pts, ndc_d[:, None, :]).reshape(n_rays, -1)
        mm_out = minmax_mlp_apply(
            params["sampler"], sampler_in, statics.mmnetskips, cdt
        )
    if statics.stop_sampler_grad:
        mm_out = jax.lax.stop_gradient(mm_out)
    mm_rgb = jax.nn.sigmoid(mm_out[:, 3 * S:])
    mm_add = mm_out[:, S: 2 * S]
    mm_mul = mm_out[:, 2 * S: 3 * S]
    depth_values = jax.nn.sigmoid(mm_out[:, :S]) * (far - near) + near

    # 2. Sort depths; carry the density corrections along.
    depth_values, mm_add, mm_mul = sort_with_payloads(depth_values, mm_add, mm_mul)
    z3d = ndc_to_3d_depth(depth_values, statics.ndc_eps)

    # 3. Epipolar color features from per-ray neighbor views (never
    # differentiated — the reference wraps this whole block in no_grad).
    t_emit = False
    if statics.randomize:
        view_idx = _select_neighbors(statics, rays, scene, controls)
        imgs = scene["images"]
        is_u8_pack = imgs.ndim == 4 and imgs.dtype == jnp.int32
        per_view = (statics.train_gather == 1 and is_u8_pack) or (
            statics.train_gather == -1 and per_view_gather_auto(imgs)
        )
        if per_view:
            from pronerf_tpu.ops.warp import epipolar_colors_per_view

            colors = epipolar_colors_per_view(
                imgs, scene["fused_mats"], scene["K"], view_idx,
                rays["or_o"], rays["or_d"], jax.lax.stop_gradient(z3d),
                split=statics.gather_split,
            )  # [N, V, S, 3]
        else:
            colors = epipolar_colors(
                imgs, scene["fused_mats"], scene["K"], view_idx,
                rays["or_o"], rays["or_d"], jax.lax.stop_gradient(z3d),
                split=statics.gather_split and is_u8_pack,
            )  # [N, V, S, 3]
    else:
        # Deterministic eval/inference: one shared view set -> compacted
        # single-view gathers (the TPU fast path; see
        # ops/warp.py:epipolar_colors_shared). When the per-view table
        # exceeds the gather staging cliff (full-res serving), tile the
        # ray batch and gather through dynamic source-row windows.
        nearest = _nearest_views(statics, scene, controls)
        imgs = scene["images"]
        gdt = (
            jnp.bfloat16
            if (statics.gather_bf16 == 1
                or (statics.gather_bf16 == -1 and mm_kernel))
            else None
        )
        windowed = (
            statics.gather_tiles > 0 and statics.gather_window_rows > 0
            and imgs.ndim == 4 and imgs.dtype == jnp.int32
        )
        is_u8 = imgs.ndim == 4 and imgs.dtype == jnp.int32
        # Transposed emit: produce the fused kernels' rays-on-lanes layout
        # directly at the gather (ops/warp.py:_lerp_t_block) instead of
        # paying per-(tile, view) relayout copies toward epi_flat.T below.
        t_emit = (
            mm_kernel and is_u8 and not statics.gather_split
            and statics.gather_transposed == 1
        )
        if t_emit:
            from pronerf_tpu.ops.warp import mean_fill_invalid_sct

            if windowed:
                from pronerf_tpu.ops.warp import (
                    epipolar_colors_shared_windowed,
                )

                epi_v = epipolar_colors_shared_windowed(
                    imgs, scene["fused_mats"], scene["K"], nearest,
                    rays["or_o"], rays["or_d"], jax.lax.stop_gradient(z3d),
                    statics.gather_tiles, statics.gather_window_rows,
                    out_dtype=gdt, transposed_out=True,
                )  # [V, S*3, N]
            else:
                epi_v = epipolar_colors_shared(
                    imgs, scene["fused_mats"], scene["K"], nearest,
                    rays["or_o"], rays["or_d"], jax.lax.stop_gradient(z3d),
                    out_dtype=gdt, transposed_out=True,
                )  # [V, S*3, N]
            n_views = epi_v.shape[0]
            epi_v = mean_fill_invalid_sct(
                epi_v.reshape(n_views, S, 3, n_rays)
            )
            epi_v = jax.lax.stop_gradient(epi_v)
            if statics.epi_layout == "svc":
                epi_t = jnp.swapaxes(epi_v, 0, 1).reshape(-1, n_rays)
            else:
                epi_t = epi_v.reshape(-1, n_rays)  # [V*S*3, N]
        elif windowed:
            from pronerf_tpu.ops.warp import epipolar_colors_shared_windowed

            colors = epipolar_colors_shared_windowed(
                imgs, scene["fused_mats"], scene["K"], nearest,
                rays["or_o"], rays["or_d"], jax.lax.stop_gradient(z3d),
                statics.gather_tiles, statics.gather_window_rows,
                split=statics.gather_split, out_dtype=gdt,
            )
        else:
            colors = epipolar_colors_shared(
                imgs, scene["fused_mats"], scene["K"], nearest,
                rays["or_o"], rays["or_d"], jax.lax.stop_gradient(z3d),
                split=statics.gather_split and is_u8, out_dtype=gdt,
            )  # [N, V, S, 3]
    if not t_emit:
        colors = mean_fill_invalid(colors)
        colors = jax.lax.stop_gradient(colors)
        if statics.epi_layout == "svc":
            epi_flat = jnp.swapaxes(colors, 1, 2).reshape(n_rays, -1)
        else:
            epi_flat = colors.reshape(n_rays, -1)  # [N, V*S*3]
        epi_t = None
    else:
        epi_flat = None

    # 4. Refine net on [Pluecker(candidates) || warped colors]. Same
    # collinearity fold as the sampler: the 8 candidate points share one
    # Pluecker signature.
    if mm_kernel:
        packed_r = params.get("refine_packed")
        if packed_r is None:
            packed_r = pack_minmax_params(params["refine"], S, kdt_mm)
        # match dtypes so a bf16 gather boundary isn't promoted back to f32
        # at the concat (the kernel casts to bf16 on entry either way)
        epi_rows_t = epi_t if epi_t is not None else epi_flat.T
        refine_out = fused_minmax_t(
            packed_r,
            jnp.concatenate(
                [sig_t.astype(epi_rows_t.dtype), epi_rows_t], axis=0
            ),
            rays_per_block=statics.pallas_block_rays, interpret=interp,
        )[:, : 4 * S + 3]
    elif fold_mm:
        refine_out = minmax_mlp_apply_folded(
            params["refine"], sig, S, epi_flat, cdt
        )
    else:
        epi_pts = ray_points(ndc_o, ndc_d, depth_values)
        plk = plucker(epi_pts, ndc_d[:, None, :]).reshape(n_rays, -1)
        refine_out = minmax_mlp_apply(
            params["refine"],
            jnp.concatenate([plk, epi_flat], axis=-1),
            statics.mmnetskips,
            cdt,
        )
    if statics.stop_sampler_grad:
        refine_out = jax.lax.stop_gradient(refine_out)
    refine_sig = jax.nn.sigmoid(refine_out[:, :S])
    refine_rgb = jax.nn.sigmoid(refine_out[:, 4 * S:])
    points_offset = jnp.tanh(refine_out[:, S: 4 * S]).reshape(n_rays, S, 3)

    # 5. Bin-constrained refined depths + branch-specific surgery.
    z_vals = bin_constrain(depth_values, refine_sig, near, far)
    num_valid = None
    noise_key, jitter_key = jax.random.split(controls["rng"])
    if statics.explore:
        z_vals, num_valid = explore_expand(
            z_vals, controls["n_mult"], controls["dir_expand"], near, far,
            statics.max_expand,
        )
        # Pre-drawn noise (bucketed exploration, stage1.py): slice the
        # width-max noise stream so every bucket width sees identical
        # per-slot draws — numerics match the static-width step.
        jn = controls.get("jitter_noise")
        jittered = gap_jitter(
            jitter_key, z_vals, near, far, controls["dir_jitter"], 0.99,
            noise=None if jn is None else jn[:, : statics.max_expand],
        )
        idx = jnp.arange(statics.max_expand, dtype=jnp.int32)
        z_vals = jnp.where(idx[None, :] < num_valid, jittered, far)
    elif statics.jitter:
        z_vals = gap_jitter(
            jitter_key, z_vals, near, far, controls["dir_jitter"], 1.0 - 2e-6
        )

    query_pts = ray_points(ndc_o, ndc_d, z_vals)
    if statics.add_offsets:
        query_pts = query_pts + statics.offset_scale * points_offset

    # 6. NeRF forward (fused Pallas kernel on the inference path, plain XLA
    # otherwise) + shared compositing.
    comp = None
    sigma_out = None
    if statics.use_pallas:
        # In-VMEM PE + MLP chain; the view-dir ENCODING stays in XLA. No AD
        # through pallas_call — inference graphs only. With fuse_composite
        # (and inference semantics) alpha compositing streams inside the
        # kernel along the sample grid axis; otherwise raw returns to XLA.
        from pronerf_tpu.kernels.fused_nerf import (
            fused_nerf_composite_t,
            fused_nerf_raw_t,
            pack_nerf_params,
        )

        kdt = jnp.bfloat16 if cdt is not None else jnp.float32
        d_pe = positional_encoding(rays["viewdirs"], statics.multires_views)
        wv = params["nerf"]["views"]["w"]
        vcon_t = jax.lax.dot_general(
            wv[wv.shape[0] - d_pe.shape[-1]:].astype(kdt), d_pe.astype(kdt),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [128, N]
        # Build the [S*3, N] transposed query points from 1-D per-ray
        # vectors (no [N, S, 3] intermediate -> no relayout staging
        # around the kernel; see fused_nerf_raw_t).
        n_s = z_vals.shape[-1]
        po = refine_out[:, S: 4 * S]  # [N, 3S], [n, 3s + c] layout
        rows24 = []
        for s_i in range(n_s):
            for c_i in range(3):
                row = ndc_o[:, c_i] + ndc_d[:, c_i] * z_vals[:, s_i]
                if statics.add_offsets:
                    row = row + statics.offset_scale * jnp.tanh(
                        po[:, 3 * s_i + c_i]
                    )
                rows24.append(row)
        pts24_t = jnp.stack(rows24, axis=0)
        fuse_comp = (
            statics.fuse_composite and statics.noise_std == 0.0
            and not statics.explore and not statics.clamp_raw
            and statics.use_mm
        )
        if statics.quant == "int8":
            # int8 MXU serving path (opt-in; composite stays in XLA —
            # fuse_composite measured worse there anyway, see above)
            from pronerf_tpu.kernels.fused_nerf_q import (
                fused_nerf_raw_tq,
                pack_nerf_params_int8,
            )

            packed_q = params.get("nerf_packed_q")
            if packed_q is None:
                packed_q = pack_nerf_params_int8(params["nerf"])
            raw = fused_nerf_raw_tq(
                packed_q, pts24_t, vcon_t, n_samples=n_s,
                rays_per_block=statics.pallas_block_rays,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            packed = params.get("nerf_packed")
            if packed is None:
                packed = pack_nerf_params(
                    params["nerf"],
                    jnp.bfloat16 if cdt is not None else jnp.float32,
                )
            if fuse_comp:
                out_k = fused_nerf_composite_t(
                    packed, pts24_t, vcon_t,
                    z_vals.T.astype(jnp.float32),
                    mm_add.T.astype(jnp.float32),
                    mm_mul.T.astype(jnp.float32),
                    jnp.linalg.norm(ndc_d, axis=-1)[None, :].astype(
                        jnp.float32
                    ),
                    n_samples=n_s, white_bkgd=statics.white_bkgd,
                    rays_per_block=statics.pallas_block_rays,
                    interpret=jax.default_backend() != "tpu",
                )
                comp = out_k
                sigma_out = out_k["sigma"]
            else:
                raw = fused_nerf_raw_t(
                    packed, pts24_t, vcon_t, n_samples=n_s,
                    rays_per_block=statics.pallas_block_rays,
                    interpret=jax.default_backend() != "tpu",
                )
    else:
        x_pe = positional_encoding(query_pts, statics.multires)
        d_pe = positional_encoding(rays["viewdirs"], statics.multires_views)
        if cdt is None or statics.netarch == "donerf":
            # Parity path (and donerf) broadcasts dirs per point; the
            # serving path hands nerf_mlp_apply the per-ray encoding.
            d_pe = jnp.broadcast_to(
                d_pe[:, None, :], (n_rays, z_vals.shape[-1], d_pe.shape[-1])
            )
        if statics.netarch == "donerf":
            from pronerf_tpu.models.donerf import donerf_apply

            raw = donerf_apply(params["nerf"], x_pe, d_pe, compute_dtype=cdt)
        else:
            raw = nerf_mlp_apply(
                params["nerf"], x_pe, d_pe, statics.netskips, cdt
            )

    if comp is None:
        noise = None
        if statics.noise_std > 0.0:
            rn = controls.get("raw_noise")
            if rn is None:
                rn = jax.random.normal(noise_key, z_vals.shape, z_vals.dtype)
            else:  # pre-drawn at max width (bucketed exploration)
                rn = rn[:, : z_vals.shape[-1]].astype(z_vals.dtype)
            noise = statics.noise_std * rn
        comp = composite(
            raw,
            z_vals,
            ndc_d,
            noise=noise,
            mm_add=mm_add if statics.use_mm else None,
            mm_mul=mm_mul if statics.use_mm else None,
            clamp_raw=statics.clamp_raw,
            num_valid=num_valid,
            white_bkgd=statics.white_bkgd,
        )
        sigma_out = raw[..., 3]
    return {
        "rgb0": refine_rgb,
        "rgb1": comp["rgb"],
        "depth": comp["depth"],
        "disp": comp["disp"],
        "acc": comp["acc"],
        "weights": comp["weights"],
        "mm_rgb": mm_rgb,
        "depth0": jnp.mean(jax.lax.stop_gradient(z_vals), axis=-1),
        "sigma": sigma_out,
    }
