"""Training drivers for stage 1 (alternating) and stage 2 (joint).

Behavioral parity (SURVEY.md §2.2-2.3, §3.1-3.2):
- 500k iterations (+1), batches of N_rand rays sliced from a pre-shuffled
  pool that reshuffles on exhaustion;
- stage 1 alternates: odd i -> NeRF step, even i -> sampler step; one LR
  schedule (with the /2 quirk) applied to both optimizers;
- expdir contract: ``basedir/expname/args.txt`` (sorted flag dump),
  ``config.txt`` (verbatim config copy), ``%06d.ckpt`` snapshots every
  i_weights, test-set renders every i_testset under ``testset_%06d``;
- auto-resume from the newest checkpoint unless --no_reload; stage 2
  bootstraps from --pretrain_path (stage-1 keys) separately from resume;
- checkpoints use the reference's logical key names (network_fn /
  mmr_network_fn / refine_net / network_fine / optimizer / s_optimizer /
  optimizer_nerf) so checkpoint tooling maps 1:1;
- non-finite loss fails fast (replacing the reference's breakpoint() guard).

Host-side randomness (neighbor subset, n_mult, direction coins) is drawn
with one numpy Generator per run and passed into the compiled steps as
traced scalars — the graphs never retrace.
"""

from __future__ import annotations

import dataclasses
import shutil
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pronerf_tpu.config import Config
from pronerf_tpu.models.pronerf import RenderStatics, init_pronerf_params
from pronerf_tpu.render.raygen import build_ray_pool, prepare_scene
from pronerf_tpu.render.renderer import render_path
from pronerf_tpu.train.checkpoint import (
    checkpoint_path,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from pronerf_tpu.train.stage1 import init_stage1_state, make_stage1_steps
from pronerf_tpu.train.stage2 import init_stage2_state, make_stage2_step
from pronerf_tpu.train.state import stage1_lr, stage2_lr

N_ITERS_DEFAULT = 500_000


# ---------------------------------------------------------------- data --

def load_training_data(cfg: Config):
    """Load LLFF data (or a synthetic stand-in when datadir=='synthetic')
    and derive the train/test split + intrinsics."""
    if cfg.dataset_type != "llff":
        raise ValueError("Only dataset_type=llff is supported (reference parity)")
    if cfg.no_ndc:
        raise NotImplementedError(
            "no_ndc is not supported: the ProNeRF sampler operates in NDC"
        )
    if cfg.epi_nerf:
        raise NotImplementedError(
            "--epi_nerf references an undefined model in the release tree "
            "(run_S_eS_eN_alter_base.py:390, NameError) and is not supported"
        )
    if cfg.no_batching or cfg.full_image:
        raise NotImplementedError(
            "no_batching/full_image single-image sampling is not part of the "
            "release path (the reference always uses the shuffled ray pool)"
        )
    if cfg.datadir.startswith("synthetic"):
        from pronerf_tpu.utils.synthetic import (
            make_consistent_scene,
            parse_synthetic_spec,
        )

        sc = make_consistent_scene(seed=cfg.seed,
                                   **parse_synthetic_spec(cfg.datadir))
        images, K = sc["images"], sc["K"]
        H, W, focal = sc["hwf"]
        poses = np.concatenate(
            [
                sc["poses"],
                np.tile(
                    np.array([[H], [W], [focal]], np.float32)[None],
                    (len(images), 1, 1),
                ),
            ],
            axis=-1,
        )
        render_poses = poses[:4].copy()
    else:
        from pronerf_tpu.data.llff import load_llff_data

        images, poses, bds, render_poses, i_test_single = load_llff_data(
            cfg.datadir, factor=cfg.factor, recenter=True, bd_factor=0.75,
            spherify=cfg.spherify,
        )
    hwf = poses[0, :3, -1]
    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    poses34 = poses[:, :3, :4]

    if cfg.llffhold > 0:
        i_test = np.arange(images.shape[0])[:: cfg.llffhold]
    else:
        i_test = np.array([0])
    i_train = np.array(
        [i for i in range(images.shape[0]) if i not in i_test]
    )
    K = np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32
    )
    return {
        "images": images,
        "poses": poses34,
        "render_poses": np.asarray(render_poses)[:, :3, :4],
        "i_train": i_train,
        "i_test": i_test,
        "H": H,
        "W": W,
        "focal": focal,
        "K": K,
    }


# ------------------------------------------------------------- expdir --

def setup_expdir(cfg: Config) -> Path:
    expdir = Path(cfg.basedir) / cfg.expname
    expdir.mkdir(parents=True, exist_ok=True)
    with open(expdir / "args.txt", "w") as fh:
        for f in sorted(dataclasses.fields(cfg), key=lambda f: f.name):
            fh.write(f"{f.name} = {getattr(cfg, f.name)}\n")
    if cfg.config and Path(cfg.config).exists():
        shutil.copy(cfg.config, expdir / "config.txt")
    return expdir


# --------------------------------------------------- checkpoint layout --

def stage1_ckpt(state) -> dict:
    return {
        "global_step": state["global_step"],
        "network_fn": state["params"]["nerf"],
        "mmr_network_fn": state["params"]["sampler"],
        "refine_net": state["params"]["refine"],
        "optimizer": state["opt_nerf"],
        "s_optimizer": state["opt_s"],
    }


def stage1_restore(ckpt_file, state) -> dict:
    tpl = stage1_ckpt(state)
    loaded = load_checkpoint(ckpt_file, tpl)
    state = dict(state)
    state["global_step"] = jnp.asarray(loaded["global_step"])
    state["params"] = {
        "nerf": loaded["network_fn"],
        "sampler": loaded["mmr_network_fn"],
        "refine": loaded["refine_net"],
    }
    state["opt_nerf"] = loaded["optimizer"]
    state["opt_s"] = loaded["s_optimizer"]
    return state


def stage2_ckpt(state, vestigial_nerf) -> dict:
    return {
        "global_step": state["global_step"],
        "network_fn": vestigial_nerf,  # untrained copy, layout parity
        "network_fine": state["params"]["nerf"],
        "mmr_network_fn": state["params"]["sampler"],
        "refine_net": state["params"]["refine"],
        "optimizer_state_dict": state["opt"],
        "optimizer_nerf": state["opt_nerf"],
    }


def stage2_restore(ckpt_file, state, vestigial_nerf) -> tuple:
    tpl = stage2_ckpt(state, vestigial_nerf)
    loaded = load_checkpoint(ckpt_file, tpl)
    state = dict(state)
    state["global_step"] = jnp.asarray(loaded["global_step"])
    state["params"] = {
        "nerf": loaded["network_fine"],
        "sampler": loaded["mmr_network_fn"],
        "refine": loaded["refine_net"],
    }
    state["opt"] = loaded["optimizer_state_dict"]
    state["opt_nerf"] = loaded["optimizer_nerf"]
    return state, loaded["network_fn"]


def load_params_for_inference(ckpt_file, params_template) -> dict:
    """Pull net weights from either a stage-2 (network_fine) or stage-1
    (network_fn) checkpoint (``run_S_eS_eN_alter_trt.py:473-481`` reads the
    stage-2 keys)."""
    raw = load_checkpoint(ckpt_file, raw=True)
    from flax import serialization

    key = "network_fine" if "network_fine" in raw else "network_fn"
    return {
        "nerf": serialization.from_state_dict(params_template["nerf"], raw[key]),
        "sampler": serialization.from_state_dict(
            params_template["sampler"], raw["mmr_network_fn"]
        ),
        "refine": serialization.from_state_dict(
            params_template["refine"], raw["refine_net"]
        ),
    }


# ---------------------------------------------------------------- loops --

def _init_params(cfg: Config, key):
    return init_pronerf_params(
        key,
        netarch=cfg.netarch,
        netdepth=cfg.netdepth,
        netwidth=cfg.netwidth,
        mmnetdepth=cfg.mmnetdepth,
        mmnetwidth=cfg.mmnetwidth,
        N_samples=cfg.N_samples,
        N_point_ray_enc=cfg.N_point_ray_enc,
        num_neighbor=cfg.num_neighbor,
        multires=cfg.multires,
        multires_views=cfg.multires_views,
    )


def _draw_controls(rng: np.random.Generator, n_train: int, cfg: Config, step: int):
    max_mult = max(1, 64 // cfg.N_samples)
    subset = np.sort(
        rng.choice(n_train - 1, size=cfg.num_neighbor, replace=False)
    )
    return {
        "rng": jax.random.PRNGKey(np.int64(cfg.seed * 1_000_003 + step)),
        "n_mult": jnp.int32(rng.integers(1, max_mult + 1)),
        "dir_expand": jnp.asarray(bool(rng.random() > 0.5)),
        "dir_jitter": jnp.asarray(bool(rng.random() > 0.5)),
        "neighbor_subset": jnp.asarray(subset, jnp.int32),
        "target_t": jnp.zeros((3,), jnp.float32),
    }


def _eval_statics(cfg: Config, stage: int) -> RenderStatics:
    """Deterministic render statics for in-training eval (testset / i_img /
    i_video), matching the training stage's behavior matrix."""
    statics = (
        RenderStatics.stage1_sampler(randomize=False)
        if stage == 1 else RenderStatics.stage2(randomize=False)
    )
    return dataclasses.replace(
        statics, netarch=cfg.netarch, N_samples=cfg.N_samples,
        N_point_ray_enc=cfg.N_point_ray_enc,
        num_neighbor=cfg.num_neighbor, multires=cfg.multires,
        multires_views=cfg.multires_views, white_bkgd=cfg.white_bkgd,
    )


def _spiral_video(cfg: Config, stage: int, i: int, expdir, data, scene,
                  params, H, W, K):
    """``i_video``: spiral-path video during training. The reference defines
    the flag but never writes any video (SURVEY §5 'vestigial'); here it is
    implemented via the render-path machinery."""
    from pronerf_tpu.render.renderer import save_video

    res = render_path(
        data["render_poses"], params, scene, _eval_statics(cfg, stage),
        H, W, K, savedir=None, tile_rays=cfg.tile_rays,
    )
    out = save_video(res["rgbs1"], expdir / f"spiral_{i:06d}.mp4")
    print(f"Saved spiral video {out}")


def run_training(cfg: Config, stage: int):
    """Entry point for train-stage1 (stage=1) and train-stage2 (stage=2)."""
    from pronerf_tpu.config import enforce_flag_contract

    enforce_flag_contract(cfg)
    data = load_training_data(cfg)
    H, W, focal, K = data["H"], data["W"], data["focal"], data["K"]
    i_train, i_test = data["i_train"], data["i_test"]
    expdir = setup_expdir(cfg)

    scene = prepare_scene(
        data["images"][i_train], data["poses"][i_train], K
    )

    key = jax.random.PRNGKey(cfg.seed)
    params = _init_params(cfg, key)
    vestigial_nerf = None
    if stage == 1:
        state = init_stage1_state(params, cfg.weight_decay)
        nerf_step, sampler_step = make_stage1_steps(cfg, H, W, focal)
        lr_fn = lambda s: stage1_lr(s, cfg.lrate, cfg.lrate_decay)
    else:
        if cfg.pretrain_path:
            # Accept either a checkpoint file or a stage-1 expdir (resolve
            # to its newest *.ckpt — same semantics as train-multi's
            # --pretrain-path). Caught by the fern-scale release dress
            # rehearsal in round 4: the documented
            # `train-stage2 --pretrain-path <stage1-expdir>` flow crashed
            # with IsADirectoryError.
            pre = Path(cfg.pretrain_path)
            if pre.is_dir():
                resolved = latest_checkpoint(pre)
                if resolved is None:
                    raise FileNotFoundError(
                        f"--pretrain-path {pre} contains no *.ckpt"
                    )
                pre = resolved
            tmp_state = init_stage1_state(params, cfg.weight_decay)
            tmp_state = stage1_restore(pre, tmp_state)
            params = tmp_state["params"]
        vestigial_nerf = jax.tree_util.tree_map(
            jnp.copy, _init_params(cfg, jax.random.PRNGKey(cfg.seed + 1))["nerf"]
        )
        state = init_stage2_state(params, cfg.weight_decay)
        train_step = make_stage2_step(cfg, H, W, focal)
        lr_fn = lambda s: stage2_lr(s, cfg.lrate, cfg.lrate_decay)

    # auto-resume
    start = 0
    ckpt_file = cfg.ft_path or latest_checkpoint(expdir)
    if ckpt_file and not cfg.no_reload:
        print(f"Reloading from {ckpt_file}")
        if stage == 1:
            state = stage1_restore(ckpt_file, state)
        else:
            state, vestigial_nerf = stage2_restore(
                ckpt_file, state, vestigial_nerf
            )
        start = int(state["global_step"])

    rng = np.random.default_rng(cfg.seed)
    pool, pool_ids = build_ray_pool(
        data["images"], data["poses"], K, list(i_train), cfg.num_neighbor, rng
    )
    pool_j = jnp.asarray(pool)
    ids_j = jnp.asarray(pool_ids)
    i_batch = 0

    n_iters = N_ITERS_DEFAULT + 1
    if cfg.max_steps is not None:
        n_iters = start + cfg.max_steps + 1

    from pronerf_tpu.utils.logging import MetricsLogger, save_image_log

    logger = MetricsLogger(expdir)
    print(f"Begin stage {stage}: iters [{start + 1}, {n_iters}) "
          f"res {W}x{H} train views {len(i_train)} test views {len(i_test)}")
    t_start = time.time()
    loss_val = psnr_val = float("nan")

    # Device-resident fast path: chunks of scan_steps per dispatch (see
    # train/fast_loop.py). Falls through to the per-step loop for the tail
    # and for all logging/checkpoint boundaries.
    chunk = cfg.scan_steps
    pool_batches = pool.shape[0] // cfg.N_rand
    if chunk > pool_batches > 0:
        # The executor wraps the in-chunk batch index modulo the pool's
        # batch capacity (see fast_loop._one_step): each chunk cycles the
        # whole (freshly reshuffled) pool ~chunk/pool_batches times. Loud
        # because it deviates from the reference's strictly-per-epoch
        # reshuffle on scenes this small.
        print(f"[TRAIN] note: ray pool holds only {pool_batches} batches "
              f"of {cfg.N_rand}; each {chunk}-step scan chunk cycles the "
              f"reshuffled pool ~{chunk / pool_batches:.1f}x (in-chunk "
              f"epoch wrap)")
    if stage == 1:
        chunk -= chunk % 2  # stage-1 executor scans step PAIRS
    use_scan = cfg.scan_steps > 1 and chunk >= 2
    if use_scan and stage == 1 and start % 2 != 0:
        print("[TRAIN] note: stage-1 scan executor requires an even resume "
              "step (pair-scan alternation); using the per-step loop")
        use_scan = False
    if use_scan:
        from pronerf_tpu.train.fast_loop import make_scan_executor

        executor = make_scan_executor(
            cfg, H, W, focal, len(i_train), stage, chunk
        )
        base_key = jax.random.PRNGKey(cfg.seed + 987654321)
        i = start
        stride = chunk * cfg.N_rand

        def crossed(period, a, b):
            return period and period > 0 and (a // period) != (b // period)

        while n_iters - 1 - i >= chunk:
            if i_batch + stride > pool.shape[0]:
                # Device-resident reshuffle (fast_loop.device_reshuffle):
                # the host-permute+re-upload alternative ships the whole
                # pool (~129 MB at fern scale) through the link every pool
                # epoch. Keyed from the same host rng stream so runs stay
                # deterministic per seed.
                from pronerf_tpu.train.fast_loop import device_reshuffle

                pool_j, ids_j = device_reshuffle(
                    pool_j, ids_j,
                    jax.random.PRNGKey(int(rng.integers(0, 2**63 - 1))),
                )
                i_batch = 0
            state, metrics = executor(
                state, scene, pool_j, ids_j, i_batch, base_key
            )
            i_prev, i = i, i + chunk
            i_batch += stride

            # Fail fast on EVERY chunk (one scalar readback), not only at
            # print crossings — a divergence inside a chunk must not train
            # on garbage until the next i_print boundary.
            loss_val = float(metrics["mean_loss"])
            if not np.isfinite(loss_val):
                raise FloatingPointError(
                    f"Non-finite chunk-mean loss {loss_val} at iter {i}"
                )

            if crossed(cfg.i_print, i_prev, i):
                psnr_val = float(metrics["mean_psnr"])
                rate = (i - start) / max(time.time() - t_start, 1e-9)
                print(
                    f"[TRAIN] Iter: {i} Loss: {loss_val:.6f} "
                    f"PSNR: {psnr_val:.3f} (chunk means) "
                    f"lr: {lr_fn(i - 1):.3e} it/s: {rate:.2f}"
                )
                logger.log(i, loss=loss_val, psnr=psnr_val, it_per_s=rate,
                           mode="scan")

            # events fire chunk-aligned (at most chunk-1 steps late;
            # checkpoints are named by the ACTUAL step)
            if crossed(cfg.i_weights, i_prev, i):
                path = checkpoint_path(expdir, i)
                if stage == 1:
                    save_checkpoint(path, stage1_ckpt(state))
                else:
                    save_checkpoint(path, stage2_ckpt(state, vestigial_nerf))
                print(f"Saved checkpoints at {path}")
            if cfg.i_testset > 0 and crossed(cfg.i_testset, i_prev, i) \
                    and i > start + chunk:
                testsavedir = expdir / f"testset_{i:06d}"
                render_path(
                    data["poses"][i_test], state["params"], scene,
                    _eval_statics(cfg, stage),
                    H, W, K, gt_imgs=data["images"][i_test],
                    savedir=testsavedir, tile_rays=cfg.tile_rays,
                )
                print("Saved test set")
            if cfg.i_video > 0 and crossed(cfg.i_video, i_prev, i) \
                    and i > start + chunk:
                _spiral_video(cfg, stage, i, expdir, data, scene,
                              state["params"], H, W, K)
        start_tail = i
        iter_range = range(start_tail + 1, n_iters)
    else:
        iter_range = range(start + 1, n_iters)

    for i in iter_range:
        if i_batch + cfg.N_rand > pool.shape[0]:
            perm = rng.permutation(pool.shape[0])
            pool, pool_ids = pool[perm], pool_ids[perm]
            pool_j = jnp.asarray(pool)
            ids_j = jnp.asarray(pool_ids)
            i_batch = 0
        batch = jax.lax.dynamic_slice_in_dim(pool_j, i_batch, cfg.N_rand)
        bids = jax.lax.dynamic_slice_in_dim(ids_j, i_batch, cfg.N_rand)
        i_batch += cfg.N_rand

        controls = _draw_controls(rng, len(i_train), cfg, i)
        lr = lr_fn(i - 1)  # reference decays on pre-increment global_step

        if stage == 1:
            step_fn = nerf_step if i % 2 != 0 else sampler_step
        else:
            step_fn = train_step
        state, metrics = step_fn(state, scene, batch, bids, controls, lr)

        if i % cfg.i_print == 0 or i == n_iters - 1:
            loss_val = float(metrics["loss"])
            psnr_val = float(metrics["psnr"])
            if not np.isfinite(loss_val):
                raise FloatingPointError(
                    f"Non-finite loss {loss_val} at iter {i}"
                )
            rate = (i - start) / max(time.time() - t_start, 1e-9)
            print(
                f"[TRAIN] Iter: {i} Loss: {loss_val:.6f} PSNR: {psnr_val:.3f} "
                f"lr: {lr:.3e} it/s: {rate:.2f}"
            )
            logger.log(i, loss=loss_val, psnr=psnr_val, lr=lr, it_per_s=rate,
                       branch="nerf" if (stage == 1 and i % 2 != 0) else
                       ("sampler" if stage == 1 else "joint"))

        if i % cfg.i_weights == 0:
            path = checkpoint_path(expdir, i)
            if stage == 1:
                save_checkpoint(path, stage1_ckpt(state))
            else:
                save_checkpoint(path, stage2_ckpt(state, vestigial_nerf))
            print(f"Saved checkpoints at {path}")

        if cfg.i_img > 0 and i % cfg.i_img == 0 and len(i_test) > 0:
            # implemented i_img (vestigial in the reference): one held-out
            # render logged as PNG
            from pronerf_tpu.render.renderer import make_frame_renderer

            r = make_frame_renderer(
                _eval_statics(cfg, stage), H, W, K, cfg.tile_rays
            )
            out = r(state["params"], scene,
                    jnp.asarray(data["poses"][i_test[0]]))
            save_image_log(expdir, i, "test0", np.asarray(out["rgb1"]))

        if cfg.i_testset > 0 and i % cfg.i_testset == 0 and i > start + 1:
            testsavedir = expdir / f"testset_{i:06d}"
            render_path(
                data["poses"][i_test], state["params"], scene,
                _eval_statics(cfg, stage),
                H, W, K, gt_imgs=data["images"][i_test],
                savedir=testsavedir, tile_rays=cfg.tile_rays,
            )
            print("Saved test set")

        if cfg.i_video > 0 and i % cfg.i_video == 0 and i > start + 1:
            _spiral_video(cfg, stage, i, expdir, data, scene,
                          state["params"], H, W, K)

    # final checkpoint so --max-steps smoke runs always leave one behind
    final = int(state["global_step"])
    path = checkpoint_path(expdir, final)
    if stage == 1:
        save_checkpoint(path, stage1_ckpt(state))
    else:
        save_checkpoint(path, stage2_ckpt(state, vestigial_nerf))
    print(f"Saved checkpoints at {path}")
    return state, expdir
