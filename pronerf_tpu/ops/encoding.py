"""Input encodings: NeRF positional encoding and Pluecker ray encoding.

Parity notes (SURVEY.md §2.5):
- positional encoding layout is ``[x, sin(2^0 x), cos(2^0 x), ...,
  sin(2^{L-1} x), cos(2^{L-1} x)]`` concatenated on the channel axis
  (reference ``run_nerf_helpers.py:635-692``); L=10 for xyz (63ch),
  L=4 for view dirs (27ch);
- the Pluecker encoding normalizes the direction and takes the moment
  ``m = p x d_hat`` of each query point treated as an origin
  (reference ``run_nerf_helpers.py:613-632``), giving 6 channels per point.
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc_dim(input_dim: int, num_freqs: int) -> int:
    return input_dim * (1 + 2 * num_freqs)


def positional_encoding(x, num_freqs: int):
    """NeRF sin/cos positional encoding with the input included.

    Args:
      x: [..., D].
      num_freqs: L frequency octaves 2^0 .. 2^{L-1}.

    Returns: [..., D * (1 + 2L)] ordered [x, sin(f0 x), cos(f0 x), ...].
    """
    if num_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    # [..., L, D]
    xb = x[..., None, :] * freqs[:, None]
    s = jnp.sin(xb)
    c = jnp.cos(xb)
    # Interleave per-frequency sin/cos blocks: [..., L, 2, D] -> [..., 2LD].
    sc = jnp.concatenate([s[..., None, :], c[..., None, :]], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    return jnp.concatenate([x, sc], axis=-1)


def plucker(points, dirs):
    """Pluecker encoding of rays through ``points`` with direction ``dirs``.

    Each query point acts as a ray origin; with the unit direction d the
    moment is m = p x d. Output concatenates [d, m] on the last axis.

    Args:
      points: [..., 3].
      dirs: [..., 3] (broadcastable to points).

    Returns: [..., 6].
    """
    d = dirs / jnp.clip(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12, None
    )
    d = jnp.broadcast_to(d, points.shape)
    m = jnp.cross(points, d)
    return jnp.concatenate([d, m], axis=-1)
