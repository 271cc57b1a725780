"""Volume rendering: transform raw MLP outputs into ray colors.

One function covers the reference's three ``raw2outputs`` variants through
static flags (SURVEY.md §2.2-2.4):

- stage 1 clamps raw to +-10 before everything
  (``run_S_eS_eN_alter_base.py:523``); stage 2 / inference do not;
- the sampler's density corrections (mm_add added to sigma, relu(mm_mul)
  multiplying alpha) apply on stage-1 sampler steps, always in stage 2
  training and at inference;
- ``num_valid`` masks the static 64-slot exploration expansion: slots past
  num_valid contribute zero alpha and the last VALID slot gets the 1e10
  "infinite" final interval the reference gives its last sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF_DIST = 1e10


def composite(
    raw,
    z_vals,
    rays_d,
    *,
    noise=None,
    mm_add=None,
    mm_mul=None,
    clamp_raw: bool = False,
    num_valid=None,
    white_bkgd: bool = False,
):
    """Alpha-composite raw radiance-field outputs along each ray.

    Args:
      raw: [N, S, 4] (rgb logits, sigma).
      z_vals: [N, S] sample depths (ascending).
      rays_d: [N, 3] ray directions (NDC), whose norm scales the intervals.
      noise: optional [N, S] additive sigma noise (training regularizer).
      mm_add, mm_mul: optional [N, S] sampler density corrections.
      clamp_raw: clamp raw to +-10 first (stage-1 behavior).
      num_valid: optional traced int32 scalar; samples at index >= num_valid
        are masked out (exploration padding).
      white_bkgd: composite onto white.

    Returns: dict(rgb, depth, disp, acc, weights).
    """
    if clamp_raw:
        raw = jnp.clip(raw, -10.0, 10.0)
    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]

    S = z_vals.shape[-1]
    dists = jnp.concatenate(
        [
            z_vals[..., 1:] - z_vals[..., :-1],
            jnp.full_like(z_vals[..., :1], _INF_DIST),
        ],
        axis=-1,
    )
    idx = jnp.arange(S, dtype=jnp.int32)
    if num_valid is not None:
        dists = jnp.where(idx == num_valid - 1, _INF_DIST, dists)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    a = sigma
    if noise is not None:
        a = a + noise
    if mm_add is not None:
        a = a + mm_add
    alpha = 1.0 - jnp.exp(-jax.nn.relu(a) * dists)
    if mm_mul is not None:
        alpha = alpha * jax.nn.relu(mm_mul)
    if num_valid is not None:
        alpha = jnp.where(idx < num_valid, alpha, 0.0)

    # Exclusive cumulative transmittance T_i = prod_{j<i} (1 - alpha_j + 1e-10).
    # associative_scan keeps this a log-depth VPU op (jnp.cumprod can lower
    # to a sequential scan, several ms/frame at fern scale).
    trans = jax.lax.associative_scan(
        jnp.multiply, 1.0 - alpha + 1e-10, axis=-1
    )
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return {
        "rgb": rgb_map,
        "depth": depth_map,
        "disp": disp_map,
        "acc": acc_map,
        "weights": weights,
    }
