"""Multi-chip SERVING: the full-frame renderer sharded over the ray axis.

Net-new TPU design (the reference serves on one GPU, SURVEY.md §2.10).
A frame is embarrassingly parallel over rays, so serving scales the same
way training does: a 1-D ``('rays',)`` mesh, the per-pose ray bundle
sharded on axis 0, params + the reference-view scene replicated. The body
runs under ``shard_map`` so each chip renders its ray slab independently
(including the fused Pallas NeRF kernel, which partitions per shard — no
cross-chip communication exists anywhere in a frame), and the sharded
output maps back to the frame grid.

Deterministic neighbor selection (``_nearest_views``) depends only on the
replicated scene + target pose, so every shard picks identical source
views and the result is numerically shard-count independent (asserted to
atol=2e-6 in ``tests/test_parallel.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pronerf_tpu.models.pronerf import RenderStatics, render_rays
from pronerf_tpu.render.raygen import rays_for_pose

_FRAME_KEYS = ("rgb1", "rgb0", "depth", "mm_rgb", "depth0")


def make_sharded_frame_renderer(
    statics: RenderStatics,
    H: int,
    W: int,
    K,
    mesh: Mesh,
):
    """Build a jitted (params, scene, c2w) -> frame dict renderer whose ray
    axis is sharded over ``mesh``'s ``'rays'`` dimension.

    Each device renders H*W/n_devices rays of the frame in one dispatch —
    the serving analogue of ``parallel.data_parallel`` (same mesh, same
    replication choices).
    """
    from pronerf_tpu.render.renderer import resolve_gather_statics

    K = np.asarray(K)
    n_dev = mesh.shape["rays"]
    statics = resolve_gather_statics(statics, H, W, (H * W) // n_dev)
    n = H * W
    n_pad = -(-n // n_dev) * n_dev

    def shard_body(params, scene, controls, rays):
        rr_fn = render_rays
        if statics.transposed:
            from pronerf_tpu.models.pronerf_t import (
                render_rays_t,
                transposed_eligible,
            )

            if transposed_eligible(statics, scene["images"]):
                rr_fn = render_rays_t
        out = rr_fn(params, rays, scene, controls, statics)
        return {k: out[k] for k in _FRAME_KEYS}

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("rays")),
        out_specs=P("rays"),
        check_rep=False,
    )

    def render_frame(params, scene, c2w):
        from pronerf_tpu.kernels.packing import pack_serving_params

        params = pack_serving_params(params, statics)
        rays = rays_for_pose(H, W, K, c2w)
        rays = {
            k: jnp.pad(v, [(0, n_pad - n)] + [(0, 0)] * (v.ndim - 1))
            for k, v in rays.items()
        }
        controls = {
            "rng": jax.random.PRNGKey(0),
            "target_t": jnp.asarray(c2w)[:3, 3],
        }
        out = sharded(params, scene, controls, rays)
        return {
            "rgb1": out["rgb1"][:n].reshape(H, W, 3),
            "rgb0": out["rgb0"][:n].reshape(H, W, 3),
            "depth": out["depth"][:n].reshape(H, W),
            "mm_rgb": out["mm_rgb"][:n].reshape(H, W, 3),
            "depth0": out["depth0"][:n].reshape(H, W),
        }

    return jax.jit(render_frame)
