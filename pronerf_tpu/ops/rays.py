"""Ray generation and NDC projection for LLFF forward-facing scenes.

Conventions (parity with the reference, see SURVEY.md §2.5):
- camera looks along -z, x right, y up (OpenGL style);
- pixel (i, j) maps to camera-space direction
  ``[(i - cx) / fx, -(j - cy) / fy, -1]`` (reference
  ``run_nerf_helpers.py:2705-2714``);
- NDC projection shifts origins to the ``near`` plane then projects
  (reference ``run_nerf_helpers.py:2776-2793``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_rays(H: int, W: int, K, c2w):
    """Per-pixel ray origins/directions in world space.

    Args:
      H, W: image size (static Python ints).
      K: [3, 3] intrinsics.
      c2w: [3, 4] camera-to-world matrix.

    Returns:
      (rays_o, rays_d), each [H, W, 3].
    """
    K = jnp.asarray(K)
    c2w = jnp.asarray(c2w)
    i = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, axis=0)
    j = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, axis=1)
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)],
        axis=-1,
    )
    # Rotate camera-frame dirs into the world frame: d_w = R @ d_c.
    # (precision=highest: geometry must not drop to bf16 on the MXU)
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3], precision="highest")
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, K, c2w):
    """NumPy twin of :func:`get_rays` for host-side ray-pool precompute."""
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    dirs = np.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1
    )
    rays_d = np.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o, rays_d):
    """Map world-space rays of a forward-facing scene to NDC.

    Matches the standard NeRF NDC derivation: shift each origin along its ray
    to the ``near`` plane, then apply the perspective NDC warp so that depth
    t in [0, 1] covers [near, infinity).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def ray_points(rays_o, rays_d, z_vals):
    """Points along rays: o + d * z.

    Args:
      rays_o, rays_d: [..., 3].
      z_vals: [..., S].

    Returns: [..., S, 3].
    """
    return rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]


def linspace_depths(near: float, far: float, n: int, dtype=jnp.float32):
    """The fixed ray-signature depths used by the sampler net (48 linspace
    points in NDC [0, 1]; reference ``run_S_eS_eN_alter_base.py:483-498``)."""
    return jnp.linspace(near, far, n, dtype=dtype)
