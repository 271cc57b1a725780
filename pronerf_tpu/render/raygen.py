"""Scene/ray-batch preparation shared by training, eval and inference.

The pipeline consumes TWO parallel ray parameterizations per pixel
(reference ``run_S_eS_eN_alter_base.py:248-277``):
- NDC rays (near plane at 1.0) for the sampler/NeRF math, and
- the ORIGINAL world-space rays for lifting candidate depths to 3D points
  for the epipolar warp (their camera-z magnitude is 1, so the 3D depth
  1/(1-z_ndc-eps) is metric camera depth along them).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pronerf_tpu.ops.rays import get_rays, ndc_rays
from pronerf_tpu.ops.warp import (
    build_corner_stack,
    build_corner_stack_u8,
    build_rgb_word_u8,
    fuse_projection,
)


def prepare_scene(images, poses, K, pack_corners: str | bool = "u8"):
    """Device-side scene bundle for :func:`pronerf_tpu.models.render_rays`.

    Args:
      images: [T, H, W, 3] float32 training images.
      poses: [T, 3, 4] c2w training poses.
      K: [3, 3] shared intrinsics.
      pack_corners: epipolar-gather layout — 'u8' (default; 2x2 corners
        quantized to 8-bit and packed 4-per-int32 word: 4x fewer gathered
        elements, exact for 8-bit source images), 'u8-nearest' (whole-pixel
        pack, ONE element per point, nearest-neighbor sampling — a
        non-parity speed knob), 'f32' / True (12-channel float corner
        stack, lossless for float scenes), or False (plain images, four
        gathers per sample).
    """
    poses = jnp.asarray(poses)
    images = jnp.asarray(images)
    if pack_corners == "u8":
        images = build_corner_stack_u8(images)
    elif pack_corners == "u8-nearest":
        images = build_rgb_word_u8(images)
    elif pack_corners:
        images = build_corner_stack(images)
    return {
        "images": images,
        "fused_mats": fuse_projection(poses),
        "K": jnp.asarray(K),
        "poses_t": poses[:, :3, 3],
    }


def rays_for_pose(H: int, W: int, K, c2w):
    """Full-image ray bundle for one camera pose. Returns dict of [H*W, ...]."""
    rays_o, rays_d = get_rays(H, W, K, c2w)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    ndc_o, ndc_d = ndc_rays(H, W, float(K[0][0]), 1.0, rays_o, rays_d)
    flat = lambda x: x.reshape(-1, 3).astype(jnp.float32)
    return {
        "ndc_o": flat(ndc_o),
        "ndc_d": flat(ndc_d),
        "viewdirs": flat(viewdirs),
        "or_o": flat(rays_o),
        "or_d": flat(rays_d),
        "pose_id": jnp.zeros((H * W,), jnp.int32),
    }


def rays_from_pool(batch_rays, pose_ids, H: int, W: int, focal: float):
    """Ray bundle from a [N, 2, 3] (o, d) slice of the precomputed training
    ray pool plus each ray's train-view id."""
    rays_o = jnp.asarray(batch_rays[:, 0])
    rays_d = jnp.asarray(batch_rays[:, 1])
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    ndc_o, ndc_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    return {
        "ndc_o": ndc_o.astype(jnp.float32),
        "ndc_d": ndc_d.astype(jnp.float32),
        "viewdirs": viewdirs.astype(jnp.float32),
        "or_o": rays_o.astype(jnp.float32),
        "or_d": rays_d.astype(jnp.float32),
        "pose_id": jnp.asarray(pose_ids, jnp.int32),
    }


def build_ray_pool(images, poses, K, i_train, num_neighbor: int, rng: np.random.Generator):
    """Host-side precompute of the shuffled training ray pool.

    Mirrors the reference's startup precompute
    (``run_S_eS_eN_alter_base.py:849-874``): all rays of all training views
    with their target colors, shuffled once; plus each ray's train-view
    index (the reference stores a per-ray table of 1+num_neighbor nearest
    pose ids — we store just the view id and gather neighbors in-graph).

    Returns:
      rays: [M, 3, 3] float32 (origin, direction, rgb),
      view_ids: [M] int32 index INTO THE TRAIN SUBSET (0..len(i_train)-1),
      perm-shuffled consistently.

    Uses the multithreaded C++ builder (``native/pronerf_native.cpp``) when
    available; the permutation differs between the native (mt19937_64
    Fisher-Yates) and NumPy paths but both are seeded and uniform.
    """
    from pronerf_tpu.native import build_ray_pool_native

    native = build_ray_pool_native(
        np.ascontiguousarray(images[list(i_train)]),
        np.ascontiguousarray(
            np.asarray(poses)[list(i_train)][:, :3, :4]
        ),
        K,
        seed=int(rng.integers(0, 2**63 - 1)),
    )
    if native is not None:
        return native

    from pronerf_tpu.ops.rays import get_rays_np

    T = len(i_train)
    H, W = images.shape[1:3]
    all_rays = []
    all_ids = []
    for local_id, idx in enumerate(i_train):
        ro, rd = get_rays_np(H, W, K, poses[idx][:3, :4])
        rays = np.stack(
            [ro, rd, images[idx]], axis=2
        ).reshape(-1, 3, 3)  # [H*W, (o,d,rgb), 3]
        all_rays.append(rays.astype(np.float32))
        all_ids.append(np.full((H * W,), local_id, np.int32))
    rays = np.concatenate(all_rays, 0)
    ids = np.concatenate(all_ids, 0)
    perm = rng.permutation(rays.shape[0])
    return rays[perm], ids[perm]
