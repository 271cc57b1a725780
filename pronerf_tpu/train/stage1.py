"""Stage-1 alternating training: two separately-compiled steps.

The reference alternates per iteration (``run_S_eS_eN_alter_base.py:929-958``):
- odd i — NeRF "exploration" step: loss = mse(rgb1, target); only the NeRF
  params step (their own Adam state); sampler/refine run frozen; samples are
  multiplied/jittered;
- even i — sampler "exploitation" step: loss = mse(rgb1) + mse(rgb0) +
  mse(mm_rgb) (all unweighted — a_mmrgb is NOT applied in stage 1); a second
  Adam over ALL three nets steps.

These select different grads, different noise, and different sample counts,
so they are genuinely different XLA graphs — one jitted function each.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from pronerf_tpu.models.pronerf import RenderStatics, render_rays
from pronerf_tpu.ops.metrics import img2mse, mse2psnr
from pronerf_tpu.render.raygen import rays_from_pool
from pronerf_tpu.train.state import apply_updates, make_tx


def init_stage1_state(params, weight_decay: float = 0.0) -> Dict[str, Any]:
    tx = make_tx(weight_decay)
    return {
        "global_step": jnp.int64(0) if jax.config.x64_enabled else jnp.int32(0),
        "params": params,
        "opt_nerf": tx.init(params["nerf"]),
        "opt_s": tx.init(params),
    }


def make_stage1_steps(cfg, H: int, W: int, focal: float):
    """Build the two jitted stage-1 steps.

    Each step signature:
      (state, scene, batch_rays [N,3,3], pose_ids [N], controls, lr)
        -> (state, metrics dict)
    """
    nerf_fn, sampler_fn = build_stage1_step_fns(cfg, H, W, focal)
    jit = partial(jax.jit, donate_argnums=(0,))
    return jit(nerf_fn), jit(sampler_fn)


def build_stage1_step_fns(cfg, H: int, W: int, focal: float):
    """The raw (unjitted) step functions, shared by the single-chip jit
    wrapper above and the sharded wrapper in
    ``pronerf_tpu.parallel.data_parallel``."""
    tx = make_tx(cfg.weight_decay)
    # Opt-in bf16 train compute (params/grads/optimizer stay f32): the step
    # is HBM-bound on f32 activation streams — see Config.train_precision.
    cdt = "bfloat16" if getattr(cfg, "train_precision", "f32") == "bf16" \
        else None
    statics_nerf = RenderStatics.stage1_nerf(
        noise_std=cfg.raw_noise_std,
        N_samples=cfg.N_samples,
        N_point_ray_enc=cfg.N_point_ray_enc,
        num_neighbor=cfg.num_neighbor,
        multires=cfg.multires,
        multires_views=cfg.multires_views,
        white_bkgd=cfg.white_bkgd,
        netarch=cfg.netarch,
        train_gather=cfg.train_gather,
        compute_dtype=cdt,
    )
    statics_sampler = RenderStatics.stage1_sampler(
        N_samples=cfg.N_samples,
        N_point_ray_enc=cfg.N_point_ray_enc,
        num_neighbor=cfg.num_neighbor,
        multires=cfg.multires,
        multires_views=cfg.multires_views,
        white_bkgd=cfg.white_bkgd,
        netarch=cfg.netarch,
        train_gather=cfg.train_gather,
        compute_dtype=cdt,
    )

    # Bucketed exploration (``Config.explore_buckets``): the static-64
    # masked expansion evaluates the NeRF fwd+bwd on all 64 slots while
    # only S * n_mult (E ~ 36) carry weight — the measured price is a
    # stage-1 NeRF step at ~12.5% MFU (925 GFLOP executable,
    # results/probes_r4_step_timing.txt). Compiling one branch per
    # power-of-two width and selecting with ``lax.switch`` on the traced
    # n_mult keeps the no-retrace property (ONE executable, all branches
    # inside) while the device only runs the width that covers S * n_mult.
    # Noise parity: jitter + raw noise are pre-drawn at the full width and
    # sliced per branch, so every bucket sees the same per-slot stream and
    # the widest bucket is bit-identical to the static-width step (tested).
    widths = None
    if getattr(cfg, "explore_buckets", False):
        me = statics_nerf.max_expand
        widths, w = [], cfg.N_samples
        while w < me:
            widths.append(w)
            w *= 2
        widths.append(me)

    def nerf_step(state, scene, batch_rays, pose_ids, controls, lr):
        rays = rays_from_pool(batch_rays[:, :2], pose_ids, H, W, focal)
        target = batch_rays[:, 2]
        params = state["params"]

        def grads_at(statics_w, ctl):
            def loss_fn(nerf_params):
                p = dict(params, nerf=nerf_params)
                out = render_rays(p, rays, scene, ctl, statics_w)
                return img2mse(out["rgb1"], target)

            return jax.value_and_grad(loss_fn)(params["nerf"])

        if widths is None:
            loss, grads = grads_at(statics_nerf, controls)
        else:
            nk, jk = jax.random.split(controls["rng"])
            me = statics_nerf.max_expand
            n = target.shape[0]
            ctl = dict(
                controls,
                raw_noise=jax.random.normal(nk, (n, me), jnp.float32),
                jitter_noise=jax.random.normal(jk, (n, me), jnp.float32),
            )
            # smallest width covering S * n_mult
            mult_caps = jnp.asarray(
                [w // cfg.N_samples for w in widths[:-1]], jnp.int32
            )
            idx = jnp.sum(mult_caps < controls["n_mult"])
            branches = [
                partial(
                    grads_at,
                    dataclasses.replace(statics_nerf, max_expand=w),
                    ctl,
                )
                for w in widths
            ]
            loss, grads = jax.lax.switch(idx, branches)
        updates, opt_nerf = tx.update(grads, state["opt_nerf"], params["nerf"])
        new_nerf = apply_updates(params["nerf"], updates, lr)
        new_state = dict(
            state,
            params=dict(params, nerf=new_nerf),
            opt_nerf=opt_nerf,
            global_step=state["global_step"] + 1,
        )
        return new_state, {"loss": loss, "psnr": mse2psnr(loss)}

    def sampler_step(state, scene, batch_rays, pose_ids, controls, lr):
        rays = rays_from_pool(batch_rays[:, :2], pose_ids, H, W, focal)
        target = batch_rays[:, 2]

        def loss_fn(params):
            out = render_rays(params, rays, scene, controls, statics_sampler)
            img_loss = img2mse(out["rgb1"], target)
            rgb0_loss = img2mse(out["rgb0"], target)
            mm_loss = img2mse(out["mm_rgb"], target)
            total = img_loss + rgb0_loss + mm_loss
            return total, img_loss

        (loss, img_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt_s = tx.update(grads, state["opt_s"], state["params"])
        new_params = apply_updates(state["params"], updates, lr)
        new_state = dict(
            state,
            params=new_params,
            opt_s=opt_s,
            global_step=state["global_step"] + 1,
        )
        return new_state, {"loss": loss, "psnr": mse2psnr(img_loss)}

    return nerf_step, sampler_step
