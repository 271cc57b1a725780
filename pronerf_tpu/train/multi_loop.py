"""Multi-scene training driver: stage-1 alternating OR stage-2 joint
training for several scenes in one SPMD program (see
``parallel/multi_scene.py`` for the mesh design). CLI surface:
``python -m pronerf_tpu.cli train-multi [--stage 2]``.

Constraints: all scenes must share resolution and per-scene train-view
count (true for same-factor LLFF captures after cropping the view list to
the common minimum). Each scene keeps its own params, Adam state, and ray
pool; per-step controls are shared (one host draw) except the PRNG key,
which folds in the scene index (``parallel/multi_scene.py``). Checkpoints
are per-scene (reference key layout) under
``basedir/expname/scene_{name}/`` and the loop AUTO-RESUMES from them
unless ``--no-reload`` — the same contract as the single-scene loop
(``run_S_eS_eN_alter_base.py:428-446``). Stage 2 bootstraps each scene
from the matching ``scene_{name}`` checkpoint under ``--pretrain-path``
(a stage-1 multi expdir). Held-out per-scene eval renders run every
``i_testset`` steps.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pronerf_tpu.config import Config
from pronerf_tpu.parallel.multi_scene import (
    make_multi_scene_pooled_step,
    make_scene_mesh,
    place_scene_pools,
    reshuffle_scene_pools,
    stack_scenes,
)
from pronerf_tpu.render.raygen import build_ray_pool, prepare_scene
from pronerf_tpu.render.renderer import render_path
from pronerf_tpu.train.checkpoint import (
    checkpoint_path,
    latest_checkpoint,
    save_checkpoint,
)
from pronerf_tpu.train.loop import (
    _draw_controls,
    _eval_statics,
    _init_params,
    load_training_data,
    setup_expdir,
    stage1_ckpt,
    stage1_restore,
    stage2_ckpt,
    stage2_restore,
)
from pronerf_tpu.train.stage1 import init_stage1_state
from pronerf_tpu.train.stage2 import init_stage2_state
from pronerf_tpu.train.state import stage1_lr, stage2_lr


def _scene_name(datadir: str, idx: int) -> str:
    if datadir.startswith("synthetic"):
        return f"synthetic{idx}"
    return Path(datadir).name


def _slice_scene(tree, s_idx: int):
    return jax.tree_util.tree_map(lambda a: a[s_idx], tree)


def _make_mesh(n_scene: int, n_ray_shards: int, n_dev: int):
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
        return make_scene_mesh(scene_rows, n_ray_shards)
    return make_scene_mesh(
        min(n_scene, max(1, n_dev // max(1, n_ray_shards))), n_ray_shards
    )


def _eval_scenes(cfg, stage, i, expdir, datas, scenes, states_s, names):
    """Held-out render per scene; prints per-scene test PSNR."""
    statics = _eval_statics(cfg, stage)
    psnrs = {}
    for s_idx, name in enumerate(names):
        data = datas[s_idx]
        if len(data["i_test"]) == 0:
            continue
        params = _slice_scene(states_s, s_idx)["params"]
        # All held-out poses (capped by max_images like the reference's
        # --max_images, run_S_eS_eN_alter_trt.py:794-795) so the printed
        # per-scene PSNR is a true test-set mean, not a single-view sample.
        cap = cfg.max_images if cfg.max_images else len(data["i_test"])
        idx = np.asarray(data["i_test"][:cap])
        res = render_path(
            data["poses"][idx], params, scenes[s_idx], statics,
            data["H"], data["W"], data["K"],
            gt_imgs=data["images"][idx],
            savedir=expdir / f"scene_{name}" / f"testset_{i:06d}",
            tile_rays=cfg.tile_rays,
        )
        psnrs[name] = float(np.mean(res["psnrs"])) if res["psnrs"] else None
    line = " ".join(
        f"{n}:{v:.2f}" for n, v in psnrs.items() if v is not None
    )
    print(f"[TRAIN-MULTI] Iter {i} per-scene test PSNR: {line}")
    return psnrs


def run_multi_training(cfg: Config, datadirs, n_ray_shards: int = 1,
                       stage: int = 1):
    """Train one model per scene, all scenes in one dispatch/step."""
    n_scene = len(datadirs)
    mesh = _make_mesh(n_scene, n_ray_shards, len(jax.devices()))
    expdir = setup_expdir(cfg)

    datas, scenes, states, vestigials, pools, pool_ids, names = (
        [], [], [], [], [], [], []
    )
    H = W = focal = None
    n_train = None
    rng = np.random.default_rng(cfg.seed)
    for idx, datadir in enumerate(datadirs):
        sub = cfg.replace(
            datadir=datadir if ":" in datadir else "synthetic",
            seed=cfg.seed + idx,
        ) if datadir.startswith("synthetic") else cfg.replace(datadir=datadir)
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
        name = _scene_name(datadir, idx)
        datas.append(data)
        names.append(name)
        scenes.append(
            prepare_scene(
                data["images"][data["i_train"]],
                data["poses"][data["i_train"]],
                data["K"],
            )
        )
        params = _init_params(sub, jax.random.PRNGKey(cfg.seed + idx))
        if stage == 1:
            states.append(init_stage1_state(params, cfg.weight_decay))
        else:
            if cfg.pretrain_path:
                pre = latest_checkpoint(Path(cfg.pretrain_path) / f"scene_{name}")
                if pre is None:
                    raise FileNotFoundError(
                        f"no stage-1 checkpoint for scene {name} under "
                        f"{cfg.pretrain_path}/scene_{name}"
                    )
                tmp = init_stage1_state(params, cfg.weight_decay)
                params = stage1_restore(pre, tmp)["params"]
                print(f"[TRAIN-MULTI] {name}: stage-2 bootstrap from {pre}")
            vestigials.append(
                jax.tree_util.tree_map(
                    jnp.copy,
                    _init_params(sub, jax.random.PRNGKey(cfg.seed + idx + 1))[
                        "nerf"
                    ],
                )
            )
            states.append(init_stage2_state(params, cfg.weight_decay))
        p, ids = build_ray_pool(
            data["images"], data["poses"], data["K"],
            list(data["i_train"]), cfg.num_neighbor, rng,
        )
        pools.append(p)
        pool_ids.append(ids)

    # ---- auto-resume: all-or-nothing from the per-scene checkpoints ----
    start = 0
    own_ckpts = [latest_checkpoint(expdir / f"scene_{n}") for n in names]
    if not cfg.no_reload and all(c is not None for c in own_ckpts):
        for s_idx, ck in enumerate(own_ckpts):
            if stage == 1:
                states[s_idx] = stage1_restore(ck, states[s_idx])
            else:
                states[s_idx], vestigials[s_idx] = stage2_restore(
                    ck, states[s_idx], vestigials[s_idx]
                )
        steps = [int(s["global_step"]) for s in states]
        start = min(steps)
        print(f"[TRAIN-MULTI] resumed {n_scene} scenes at step {start} "
              f"(per-scene steps {steps})")
    elif not cfg.no_reload and any(c is not None for c in own_ckpts):
        print("[TRAIN-MULTI] WARNING: partial per-scene checkpoints found; "
              "starting fresh (delete or complete the set to resume)")

    print(
        f"Multi-scene stage-{stage}: {n_scene} scenes on mesh "
        f"{dict(zip(mesh.axis_names, mesh.devices.shape))} res {W}x{H}"
    )
    scenes_s = stack_scenes(scenes)
    states_s = stack_scenes(states)
    pools = np.stack(pools)
    pool_ids_arr = np.stack(pool_ids)
    # Pools live ON DEVICE for the whole run; each step slices its batch
    # in-graph from a traced scalar and epoch reshuffles are per-scene
    # device permutations — only scalars + shared controls cross the host
    # link per step (parallel/multi_scene.py:make_multi_scene_pooled_step).
    pools_d, ids_d = place_scene_pools(mesh, pools, pool_ids_arr)
    pool_len = pools.shape[1]

    if stage == 1:
        nerf_step = make_multi_scene_pooled_step(
            cfg, H, W, focal, mesh, 1, "nerf"
        )
        sampler_step = make_multi_scene_pooled_step(
            cfg, H, W, focal, mesh, 1, "sampler"
        )
        lr_fn = lambda s: stage1_lr(s, cfg.lrate, cfg.lrate_decay)
    else:
        joint_step = make_multi_scene_pooled_step(cfg, H, W, focal, mesh, 2)
        lr_fn = lambda s: stage2_lr(s, cfg.lrate, cfg.lrate_decay)

    def save_all(i):
        for s_idx, name in enumerate(names):
            state_s = _slice_scene(states_s, s_idx)
            path = checkpoint_path(expdir / f"scene_{name}", i)
            if stage == 1:
                save_checkpoint(path, stage1_ckpt(state_s))
            else:
                save_checkpoint(
                    path, stage2_ckpt(state_s, vestigials[s_idx])
                )
        print(f"Saved {n_scene} per-scene checkpoints at iter {i}")

    n_iters = 500_000 + 1
    if cfg.max_steps is not None:
        n_iters = start + cfg.max_steps + 1  # reference max_steps contract
    i_batch = 0
    t0 = time.time()
    for i in range(start + 1, n_iters):
        if i_batch + cfg.N_rand > pool_len:
            pools_d, ids_d = reshuffle_scene_pools(
                pools_d, ids_d,
                jax.random.PRNGKey(int(rng.integers(0, 2**63 - 1))),
            )
            i_batch = 0
        controls = _draw_controls(rng, n_train, cfg, i)
        lr = lr_fn(i - 1)
        if stage == 1:
            step = nerf_step if i % 2 != 0 else sampler_step
        else:
            step = joint_step
        states_s, metrics = step(
            states_s, scenes_s, pools_d, ids_d, jnp.int32(i_batch),
            controls, lr,
        )
        i_batch += cfg.N_rand

        if i % cfg.i_print == 0:
            losses = np.asarray(metrics["loss"])
            if not np.all(np.isfinite(losses)):
                raise FloatingPointError(f"Non-finite loss at iter {i}: {losses}")
            rate = (i - start) / max(time.time() - t0, 1e-9)
            per_scene = " ".join(
                f"{n}:{l:.4f}" for n, l in zip(names, losses)
            )
            print(f"[TRAIN-MULTI] Iter: {i} it/s: {rate:.2f} loss {per_scene}")

        if i % cfg.i_weights == 0:
            save_all(i)
        if cfg.i_testset > 0 and i % cfg.i_testset == 0 and i > start + 1:
            _eval_scenes(cfg, stage, i, expdir, datas, scenes, states_s, names)

    # final checkpoint so --max-steps smoke runs always leave one behind
    final = int(np.asarray(states_s["global_step"])[0])
    save_all(final)
    return states_s, names, expdir
