"""Multi-scene training driver: stage-1 alternating training for several
scenes in one SPMD program (see ``parallel/multi_scene.py`` for the mesh
design). CLI surface: ``python -m pronerf_tpu.cli train-multi``.

Constraints: all scenes must share resolution and per-scene train-view
count (true for same-factor LLFF captures after cropping the view list to
the common minimum). Each scene keeps its own params, Adam state, and ray
pool; per-step controls are shared (one host draw), matching the
single-scene loop. Checkpoints are per-scene (reference key layout) under
``basedir/expname/scene_{name}/``.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pronerf_tpu.config import Config
from pronerf_tpu.parallel.multi_scene import (
    make_multi_scene_step,
    make_scene_mesh,
    place_scene_batch,
    stack_scenes,
)
from pronerf_tpu.render.raygen import build_ray_pool, prepare_scene
from pronerf_tpu.train.checkpoint import checkpoint_path, save_checkpoint
from pronerf_tpu.train.loop import (
    _draw_controls,
    _init_params,
    load_training_data,
    setup_expdir,
    stage1_ckpt,
)
from pronerf_tpu.train.stage1 import init_stage1_state
from pronerf_tpu.train.state import stage1_lr


def _scene_name(datadir: str, idx: int) -> str:
    if datadir.startswith("synthetic"):
        return f"synthetic{idx}"
    return Path(datadir).name


def run_multi_training(cfg: Config, datadirs, n_ray_shards: int = 1):
    """Train one stage-1 model per scene, all scenes in one dispatch/step."""
    n_scene = len(datadirs)
    n_dev = len(jax.devices())
    if n_scene * n_ray_shards > n_dev:
        # Do NOT silently fall back to an unparallel (1,1) mesh: the caller
        # asked for a layout the device pool cannot honor. Shrink the scene
        # axis (scenes round-robin over mesh rows via the stacked leading
        # dim) but refuse an impossible ray-shard request outright.
        if n_ray_shards > n_dev:
            raise ValueError(
                f"ray_shards={n_ray_shards} exceeds the {n_dev} available "
                f"devices; reduce --ray-shards"
            )
        scene_rows = min(max(1, n_dev // n_ray_shards), n_scene)
        while n_scene % scene_rows:  # leading scene dim must shard evenly
            scene_rows -= 1
        print(
            f"[TRAIN-MULTI] note: {n_scene} scenes x {n_ray_shards} ray "
            f"shards > {n_dev} devices; using a ({scene_rows}, "
            f"{n_ray_shards}) mesh with scenes sharded over {scene_rows} "
            f"rows"
        )
        mesh = make_scene_mesh(scene_rows, n_ray_shards)
    else:
        mesh = make_scene_mesh(
            min(n_scene, max(1, n_dev // max(1, n_ray_shards))),
            n_ray_shards,
        )
    expdir = setup_expdir(cfg)

    scenes, states, pools, pool_ids, names = [], [], [], [], []
    H = W = focal = None
    n_train = None
    rng = np.random.default_rng(cfg.seed)
    for idx, datadir in enumerate(datadirs):
        sub = cfg.replace(datadir="synthetic", seed=cfg.seed + idx) \
            if datadir.startswith("synthetic") else cfg.replace(datadir=datadir)
        data = load_training_data(sub)
        if H is None:
            H, W, focal = data["H"], data["W"], data["focal"]
            n_train = len(data["i_train"])
        else:
            assert (H, W) == (data["H"], data["W"]), (
                "all scenes must share resolution"
            )
            assert len(data["i_train"]) == n_train, (
                "all scenes must share the train view count"
            )
        scenes.append(
            prepare_scene(
                data["images"][data["i_train"]],
                data["poses"][data["i_train"]],
                data["K"],
            )
        )
        params = _init_params(sub, jax.random.PRNGKey(cfg.seed + idx))
        states.append(init_stage1_state(params, cfg.weight_decay))
        p, ids = build_ray_pool(
            data["images"], data["poses"], data["K"],
            list(data["i_train"]), cfg.num_neighbor, rng,
        )
        pools.append(p)
        pool_ids.append(ids)
        names.append(_scene_name(datadir, idx))

    print(
        f"Multi-scene stage-1: {n_scene} scenes on mesh "
        f"{dict(zip(mesh.axis_names, mesh.devices.shape))} res {W}x{H}"
    )
    scenes_s = stack_scenes(scenes)
    states_s = stack_scenes(states)
    pools = np.stack(pools)
    pool_ids_arr = np.stack(pool_ids)

    nerf_step = make_multi_scene_step(cfg, H, W, focal, mesh, 1, "nerf")
    sampler_step = make_multi_scene_step(cfg, H, W, focal, mesh, 1, "sampler")

    n_iters = (cfg.max_steps or 500_000) + 1
    i_batch = 0
    t0 = time.time()
    for i in range(1, n_iters):
        if i_batch + cfg.N_rand > pools.shape[1]:
            perm = rng.permutation(pools.shape[1])
            pools = pools[:, perm]
            pool_ids_arr = pool_ids_arr[:, perm]
            i_batch = 0
        batch, bids = place_scene_batch(
            mesh,
            jnp.asarray(pools[:, i_batch : i_batch + cfg.N_rand]),
            jnp.asarray(pool_ids_arr[:, i_batch : i_batch + cfg.N_rand]),
        )
        i_batch += cfg.N_rand
        controls = _draw_controls(rng, n_train, cfg, i)
        lr = stage1_lr(i - 1, cfg.lrate, cfg.lrate_decay)
        step = nerf_step if i % 2 != 0 else sampler_step
        states_s, metrics = step(states_s, scenes_s, batch, bids, controls, lr)

        if i % cfg.i_print == 0:
            losses = np.asarray(metrics["loss"])
            if not np.all(np.isfinite(losses)):
                raise FloatingPointError(f"Non-finite loss at iter {i}: {losses}")
            rate = i / max(time.time() - t0, 1e-9)
            per_scene = " ".join(
                f"{n}:{l:.4f}" for n, l in zip(names, losses)
            )
            print(f"[TRAIN-MULTI] Iter: {i} it/s: {rate:.2f} loss {per_scene}")

        if i % cfg.i_weights == 0 or i == n_iters - 1:
            for s_idx, name in enumerate(names):
                state_s = jax.tree_util.tree_map(lambda a: a[s_idx], states_s)
                path = checkpoint_path(expdir / f"scene_{name}", i)
                save_checkpoint(path, stage1_ckpt(state_s))
            print(f"Saved {n_scene} per-scene checkpoints at iter {i}")
    return states_s, names, expdir
