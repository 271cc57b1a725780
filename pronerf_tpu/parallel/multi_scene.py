"""Multi-scene SPMD training: all LLFF scenes in ONE compiled program.

The BASELINE stretch goal ("all 8 LLFF forward-facing scenes, one scene per
slice partition"). Nothing like this exists in the strictly single-GPU
reference — it is pure TPU-mesh design:

- every scene-indexed tensor gains a leading ``scene`` axis (params, Adam
  state, images, poses, ray batches);
- the per-scene train step is ``jax.vmap``-ed over that axis and jitted
  with a 2-D ``Mesh(('scene', 'rays'))``: scenes are partitioned across one
  mesh axis (zero cross-scene communication — scenes are independent), and
  each scene's ray batch is further sharded over the other axis (the
  within-scene gradient psum rides ICI);
- one dispatch per step trains every scene.

Requires every scene at the same resolution / view count (LLFF-factor
datasets satisfy this after cropping to the min view count).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pronerf_tpu.train.stage1 import build_stage1_step_fns
from pronerf_tpu.train.stage2 import build_stage2_step_fn


def make_scene_mesh(n_scene: int, n_rays_shards: int = 1) -> Mesh:
    devices = np.array(jax.devices()[: n_scene * n_rays_shards])
    return Mesh(devices.reshape(n_scene, n_rays_shards), ("scene", "rays"))


def stack_scenes(scenes):
    """List of per-scene pytrees (same structure/shapes) -> one pytree with
    a leading scene axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jax.numpy.stack(xs, axis=0), *scenes
    )


def _shardings(mesh: Mesh):
    scene_first = NamedSharding(mesh, P("scene"))
    scene_rays = NamedSharding(mesh, P("scene", "rays"))
    return scene_first, scene_rays


def _scene_mapper(step_scene, mesh: Mesh):
    """How the per-scene step spans the stacked scene axis.

    Partitioned scene axis (real multi-chip mesh): ``jax.vmap`` — each
    device holds its scenes' activations, zero cross-scene comms.

    UNpartitioned scene axis (the single-chip degradation): ``lax.map`` —
    time-multiplex scenes inside the dispatch so activation temps are
    reused scene-to-scene. vmap here materializes every scene's
    exploration activations at once and OOMs at fern scale (round-5
    multi-soak: 8 scenes x [4096, 64, 256] f32 asked 16.6 GB of the
    15.75 GB HBM). Same math, same per-scene RNG folding — only the
    schedule differs.
    """
    if mesh.shape["scene"] == 1:
        def vstep(states, scenes, batch, ids, idxs, controls, lr):
            return jax.lax.map(
                lambda a: step_scene(*a, controls, lr),
                (states, scenes, batch, ids, idxs),
            )

        return vstep
    vmapped = jax.vmap(step_scene, in_axes=(0, 0, 0, 0, 0, None, None))

    def vstep(states, scenes, batch, ids, idxs, controls, lr):
        return vmapped(states, scenes, batch, ids, idxs, controls, lr)

    return vstep


def make_multi_scene_step(cfg, H: int, W: int, focal: float, mesh: Mesh,
                          stage: int = 1, branch: str = "nerf"):
    """Jitted (states, scenes, batches, ids, controls, lr) -> (states,
    metrics) where every arg has a leading scene axis. ``controls`` is
    shared across scenes (one host draw per step, like single-scene
    training) EXCEPT the PRNG key: the scene index is folded in so noise /
    jitter draws decorrelate across scenes the way independent runs would
    (the neighbor-subset positions stay shared — a documented choice)."""
    if stage == 1:
        nerf_fn, sampler_fn = build_stage1_step_fns(cfg, H, W, focal)
        step_fn = nerf_fn if branch == "nerf" else sampler_fn
    else:
        step_fn = build_stage2_step_fn(cfg, H, W, focal)

    def step_scene(state, scene, batch, ids, scene_idx, controls, lr):
        controls = dict(
            controls, rng=jax.random.fold_in(controls["rng"], scene_idx)
        )
        return step_fn(state, scene, batch, ids, controls, lr)

    vstep = _scene_mapper(step_scene, mesh)

    def stepped(states, scenes, batch, ids, controls, lr):
        idxs = jax.numpy.arange(batch.shape[0], dtype=jax.numpy.int32)
        return vstep(states, scenes, batch, ids, idxs, controls, lr)

    scene_first, scene_rays = _shardings(mesh)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        stepped,
        in_shardings=(scene_first, scene_first, scene_rays, scene_rays,
                      repl, repl),
        out_shardings=(scene_first, scene_first),
        donate_argnums=(0,),
    )


def place_scene_batch(mesh: Mesh, batch_rays, pose_ids):
    """[S, N, 3, 3] / [S, N] host batches -> sharded device arrays."""
    _, scene_rays = _shardings(mesh)
    return (
        jax.device_put(batch_rays, scene_rays),
        jax.device_put(pose_ids, scene_rays),
    )


def place_scene_pools(mesh: Mesh, pools, pool_ids):
    """[S, M, 3, 3] / [S, M] host ray POOLS -> device-resident arrays
    sharded over the scene axis. Each scene's pool stays whole on its
    scene shard; the pooled step slices batches from it in-graph."""
    scene_first, _ = _shardings(mesh)
    return (
        jax.device_put(pools, scene_first),
        jax.device_put(pool_ids, scene_first),
    )


def make_multi_scene_pooled_step(cfg, H: int, W: int, focal: float,
                                 mesh: Mesh, stage: int = 1,
                                 branch: str = "nerf"):
    """:func:`make_multi_scene_step` with DEVICE-RESIDENT ray pools.

    Signature: (states, scenes, pools, pool_ids, i_batch, controls, lr) ->
    (states, metrics); ``pools`` [S, M, 3, 3] / ``pool_ids`` [S, M] live on
    device (``place_scene_pools``) and each step slices its [S, N_rand]
    batch in-graph from the traced scalar ``i_batch``. Per step only
    scalars and the shared controls cross the host link — the per-step
    [S, N_rand, 3, 3] host upload of the batch-shipping variant costs
    ~1.2 MB x n_scenes through a high-latency tunnel (DESIGN.md 'The ray
    pool lives on device')."""
    if stage == 1:
        nerf_fn, sampler_fn = build_stage1_step_fns(cfg, H, W, focal)
        step_fn = nerf_fn if branch == "nerf" else sampler_fn
    else:
        step_fn = build_stage2_step_fn(cfg, H, W, focal)

    n_rand = cfg.N_rand

    def step_scene(state, scene, batch, ids, scene_idx, controls, lr):
        controls = dict(
            controls, rng=jax.random.fold_in(controls["rng"], scene_idx)
        )
        return step_fn(state, scene, batch, ids, controls, lr)

    vstep = _scene_mapper(step_scene, mesh)

    def stepped(states, scenes, pools, pool_ids, i_batch, controls, lr):
        batch = jax.lax.dynamic_slice_in_dim(pools, i_batch, n_rand, axis=1)
        ids = jax.lax.dynamic_slice_in_dim(pool_ids, i_batch, n_rand, axis=1)
        idxs = jax.numpy.arange(batch.shape[0], dtype=jax.numpy.int32)
        return vstep(states, scenes, batch, ids, idxs, controls, lr)

    scene_first, _ = _shardings(mesh)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        stepped,
        in_shardings=(scene_first, scene_first, scene_first, scene_first,
                      repl, repl, repl),
        out_shardings=(scene_first, scene_first),
        donate_argnums=(0,),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1))
def reshuffle_scene_pools(pools, pool_ids, key):
    """Per-scene INDEPENDENT device reshuffle of stacked ray pools
    (each scene gets its own permutation, like independent single-scene
    runs). Device-side twin of the reference's host epoch reshuffle; see
    ``train/fast_loop.py:device_reshuffle`` for the single-scene rationale.
    """
    keys = jax.random.split(key, pools.shape[0])

    def one(p, ids, k):
        perm = jax.random.permutation(k, p.shape[0])
        return jax.numpy.take(p, perm, axis=0), jax.numpy.take(
            ids, perm, axis=0
        )

    return jax.vmap(one)(pools, pool_ids, keys)
