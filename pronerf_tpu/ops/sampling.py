"""Depth-sample manipulation: sorting with payloads, NDC<->3D depth,
per-sample bin constraints, and the stage-1 "exploration" machinery.

The reference's exploration (``run_S_eS_eN_alter_base.py:689-729``) multiplies
the 8 refined samples by a per-step random integer n_mult in [1, 8] — a
dynamic shape. The TPU-native formulation is a STATIC 64-slot graph: slot j
maps to (sample s = j // n_mult, multiplier m = j % n_mult), slots with
j >= 8 * n_mult are parked at ``far`` and masked out of compositing, so one
compiled graph serves every n_mult value as a traced scalar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_with_payloads(keys, *payloads):
    """Ascending sort of ``keys`` along the last axis, carrying each payload
    through the same permutation (replaces torch.sort + torch.gather).

    Uses multi-operand ``lax.sort`` — ONE compare/select network moves keys
    and payloads together, instead of argsort + per-payload gathers (which
    cost several ms/frame at fern scale on TPU)."""
    return jax.lax.sort((keys,) + tuple(payloads), dimension=-1, num_keys=1)


def ndc_to_3d_depth(z_ndc, eps: float):
    """NDC depth in [0, 1) -> 3D camera-space depth 1 / (1 - z - eps).

    eps is stage-dependent in the reference (1e-6 stage 1 at
    ``run_S_eS_eN_alter_base.py:607``; 1e-5 stage 2 / inference) and matters
    numerically near the far plane, so it is an explicit argument.
    """
    return 1.0 / (1.0 - z_ndc - eps)


def bin_constrain(depths_sorted, refine_sig, near, far):
    """Constrain refined depths to per-sample bins around the sorted sampler
    depths: bin s spans [midpoint(s-1, s), midpoint(s, s+1)] with the first /
    last bins half-open toward near / far (``run_S_eS_eN_alter_base.py:684-687``).

    Args:
      depths_sorted: [N, S] sorted sampler depths.
      refine_sig: [N, S] refine-net sigmoids in (0, 1).
      near, far: scalars (or [N, 1]).

    Returns: [N, S] refined depths, one inside each bin.
    """
    mids = 0.5 * (depths_sorted[..., 1:] + depths_sorted[..., :-1])
    upper = jnp.concatenate(
        [mids, 0.5 * (far + depths_sorted[..., -1:])], axis=-1
    )
    lower = jnp.concatenate(
        [0.5 * (near + depths_sorted[..., :1]), mids], axis=-1
    )
    return lower + (upper - lower) * refine_sig


def explore_expand(z_vals, n_mult, direction_up, near, far, max_total: int = 64):
    """Static-width sample multiplication for the stage-1 NeRF exploration.

    For each base sample s, n_mult shifted copies are laid out sample-major
    (slot j = s * n_mult + m) with the m-th copy offset by (m / n_mult) of the
    one-sided gap toward the next (direction_up) or previous sample. Slots
    beyond 8 * n_mult are parked at ``far``. The result is sorted ascending,
    so the valid samples occupy the first ``num_valid`` slots.

    Args:
      z_vals: [N, S] refined depths (sorted).
      n_mult: traced int32 scalar in [1, max_total // S].
      direction_up: traced bool scalar (one coin per training step).
      near, far: scalars.

    Returns:
      z_expanded: [N, max_total] sorted, invalid slots == far.
      num_valid: traced int32 scalar == S * n_mult.
    """
    N, S = z_vals.shape
    n_mult = jnp.asarray(n_mult, jnp.int32)
    j = jnp.arange(max_total, dtype=jnp.int32)
    s = jnp.minimum(j // n_mult, S - 1)
    m = (j % n_mult).astype(z_vals.dtype)
    frac = m / n_mult.astype(z_vals.dtype)  # linspace(0, 1 - 1/n, n) == m/n

    next_z = jnp.concatenate(
        [z_vals[..., 1:], jnp.full_like(z_vals[..., :1], far)], axis=-1
    )
    prev_z = jnp.concatenate(
        [jnp.full_like(z_vals[..., :1], near), z_vals[..., :-1]], axis=-1
    )
    gap_up = jnp.abs(z_vals - next_z)
    gap_down = jnp.abs(z_vals - prev_z)

    base = z_vals[:, s]  # [N, max_total]
    offset = jnp.where(
        direction_up, frac[None, :] * gap_up[:, s], -frac[None, :] * gap_down[:, s]
    )
    valid = (j < S * n_mult)[None, :]
    z_exp = jnp.where(valid, base + offset, jnp.full_like(base, far))
    z_exp = jnp.sort(z_exp, axis=-1)
    return z_exp, S * n_mult


def sample_pdf(key, bins, weights, n_samples: int, det: bool = False):
    """Hierarchical inverse-CDF sampling (the classic NeRF importance
    sampler; kept for API parity — the release configs run N_importance=0,
    reference ``run_nerf_helpers.py:2804-2847``).

    Args:
      key: PRNGKey (ignored when det).
      bins: [N, B] bin edges (sorted).
      weights: [N, B-1] unnormalized weights.
      n_samples: samples to draw per ray.
      det: deterministic (midpoint linspace) instead of uniform draws.

    Returns: [N, n_samples] samples.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples), cdf.dtype)

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bin_b = jnp.take_along_axis(bins, below, axis=-1)
    bin_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bin_b + t * (bin_a - bin_b)


def gap_jitter(key, z_vals, near, far, direction_up, max_noise: float,
               noise=None):
    """One-sided gap-scaled Gaussian jitter shared by stage-1 exploration
    (max_noise=0.99) and stage-2 training (max_noise=1-2e-6).

    noise = min(|N(0,1)| / 5, max_noise); moved toward the next sample
    (direction_up) or the previous one, scaled by that gap, so ordering is
    preserved. Invalid (parked-at-far) slots see zero up-gap and are restored
    by the caller.

    ``noise`` (optional) supplies the raw N(0,1) draw instead of drawing
    from ``key`` — the bucketed exploration step (``explore_buckets``)
    pre-draws at the full ``max_expand`` width and slices per branch so
    every bucket sees the same per-slot noise stream (stage1.py).
    """
    next_z = jnp.concatenate(
        [z_vals[..., 1:], jnp.full_like(z_vals[..., :1], far)], axis=-1
    )
    prev_z = jnp.concatenate(
        [jnp.full_like(z_vals[..., :1], near), z_vals[..., :-1]], axis=-1
    )
    if noise is None:
        noise = jax.random.normal(key, z_vals.shape, z_vals.dtype)
    mag = jnp.abs(noise) / 5.0
    mag = jnp.minimum(mag, max_noise)
    up = z_vals + mag * jnp.abs(z_vals - next_z)
    down = z_vals - mag * jnp.abs(z_vals - prev_z)
    return jnp.where(direction_up, up, down)
