"""Multi-chip scaling: data parallelism over the ray axis.

The reference is strictly single-process single-GPU (SURVEY.md §2.10) —
this layer is net-new TPU design. The whole ProNeRF pipeline is
embarrassingly parallel over rays, so the natural mesh is 1-D:

- ``Mesh(devices, ('rays',))`` over ICI;
- the ray batch (and its targets / view ids) is sharded along axis 0;
- params, optimizer state, and the scene bundle (17 small images, poses,
  fused matrices) are replicated;
- jit + sharding annotations make XLA partition the loss/grad computation
  SPMD and insert the single psum needed to reduce gradients across chips —
  no hand-written collectives.

Per-chip work at the fern operating point (4096 rays / 8 chips = 512 rays)
still fills the MXU: the NeRF matmul is [512*64, 256] x [256, 256].
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pronerf_tpu.train.stage1 import build_stage1_step_fns
from pronerf_tpu.train.stage2 import build_stage2_step_fn


def make_ray_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("rays",))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def rays_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("rays"))


def shard_batch(mesh: Mesh, batch_rays, pose_ids):
    """Place a host batch sharded along rays (axis 0)."""
    sh = rays_sharding(mesh)
    return jax.device_put(batch_rays, sh), jax.device_put(pose_ids, sh)


def _shard_step(step_fn, mesh: Mesh):
    repl = replicate(mesh)
    rays = rays_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, rays, rays, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def shard_stage1_steps(cfg, H: int, W: int, focal: float, mesh: Mesh):
    """Stage-1 (nerf_step, sampler_step) jitted with ray-sharded batches."""
    nerf_fn, sampler_fn = build_stage1_step_fns(cfg, H, W, focal)
    return _shard_step(nerf_fn, mesh), _shard_step(sampler_fn, mesh)


def shard_stage2_step(cfg, H: int, W: int, focal: float, mesh: Mesh):
    return _shard_step(build_stage2_step_fn(cfg, H, W, focal), mesh)
