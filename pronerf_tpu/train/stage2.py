"""Stage-2 joint refinement training: ONE optimizer over all three nets.

Reference behavior (``run_S_eS_eN_alter_base_refine2.py:838-903``):
- bootstraps the fine NeRF / sampler / refine nets from a stage-1 checkpoint
  (--pretrain_path), separate from expdir auto-resume;
- loss = mse(rgb1) + a_mmrgb * (mse(rgb0) + mse(mm_rgb)); the release config
  sets a_mmrgb = 0 so only the NeRF output is supervised;
- a second Adam (optimizer_nerf) exists but is never stepped — we keep its
  state in the checkpoint for layout parity without updating it;
- LR decays on global_step WITHOUT the stage-1 halving.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from pronerf_tpu.models.pronerf import RenderStatics, render_rays
from pronerf_tpu.ops.metrics import img2mse, mse2psnr
from pronerf_tpu.render.raygen import rays_from_pool
from pronerf_tpu.train.state import apply_updates, make_tx


def init_stage2_state(params, weight_decay: float = 0.0) -> Dict[str, Any]:
    tx = make_tx(weight_decay)
    return {
        "global_step": jnp.int64(0) if jax.config.x64_enabled else jnp.int32(0),
        "params": params,
        "opt": tx.init(params),
        "opt_nerf": tx.init(params["nerf"]),  # vestigial, never stepped
    }


def make_stage2_step(cfg, H: int, W: int, focal: float):
    return partial(jax.jit, donate_argnums=(0,))(
        build_stage2_step_fn(cfg, H, W, focal)
    )


def build_stage2_step_fn(cfg, H: int, W: int, focal: float):
    """Raw (unjitted) stage-2 step, shared with the sharded wrapper."""
    tx = make_tx(cfg.weight_decay)
    statics = RenderStatics.stage2(
        noise_std=cfg.raw_noise_std,
        N_samples=cfg.N_samples,
        N_point_ray_enc=cfg.N_point_ray_enc,
        num_neighbor=cfg.num_neighbor,
        multires=cfg.multires,
        multires_views=cfg.multires_views,
        white_bkgd=cfg.white_bkgd,
        netarch=cfg.netarch,
        train_gather=cfg.train_gather,
        # Opt-in bf16 train compute (see Config.train_precision).
        compute_dtype="bfloat16"
        if getattr(cfg, "train_precision", "f32") == "bf16" else None,
    )
    a_mmrgb = float(cfg.a_mmrgb)

    def train_step(state, scene, batch_rays, pose_ids, controls, lr):
        rays = rays_from_pool(batch_rays[:, :2], pose_ids, H, W, focal)
        target = batch_rays[:, 2]

        def loss_fn(params):
            out = render_rays(params, rays, scene, controls, statics)
            img_loss = img2mse(out["rgb1"], target)
            aux = img2mse(out["rgb0"], target) + img2mse(out["mm_rgb"], target)
            return img_loss + a_mmrgb * aux, img_loss

        (loss, img_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt = tx.update(grads, state["opt"], state["params"])
        new_params = apply_updates(state["params"], updates, lr)
        new_state = dict(
            state,
            params=new_params,
            opt=opt,
            global_step=state["global_step"] + 1,
        )
        return new_state, {"loss": loss, "psnr": mse2psnr(img_loss)}

    return train_step
