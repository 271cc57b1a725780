"""Sharded training on the 8-device virtual CPU mesh: the sharded step must
run, reduce gradients across chips, and (up to fp reassociation) match the
single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pronerf_tpu.config import Config
from pronerf_tpu.models import init_pronerf_params
from pronerf_tpu.parallel import (
    make_ray_mesh,
    shard_batch,
    shard_stage1_steps,
    shard_stage2_step,
)
from pronerf_tpu.render import prepare_scene
from pronerf_tpu.render.raygen import build_ray_pool
from pronerf_tpu.train import make_stage1_steps, init_stage1_state
from pronerf_tpu.train.stage2 import init_stage2_state
from pronerf_tpu.utils.synthetic import make_scene


def _setup(n_rand=128):
    cfg = Config()
    cfg.N_samples, cfg.N_point_ray_enc, cfg.num_neighbor = 8, 48, 4
    cfg.mmnetdepth, cfg.raw_noise_std = 6, 1.0
    sc = make_scene(n_views=6, H=20, W=24, seed=0)
    H, W, focal = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0), mmnetdepth=6)
    rng = np.random.default_rng(0)
    pool, ids = build_ray_pool(
        sc["images"], sc["poses"], sc["K"], list(range(6)), 4, rng
    )
    controls = {
        "rng": jax.random.PRNGKey(3),
        "n_mult": jnp.int32(2),
        "dir_expand": jnp.asarray(True),
        "dir_jitter": jnp.asarray(False),
        "neighbor_subset": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "target_t": jnp.zeros((3,), jnp.float32),
    }
    return cfg, sc, scene, params, pool[:n_rand], ids[:n_rand], controls


def test_mesh_has_8_devices():
    mesh = make_ray_mesh()
    assert mesh.devices.size == 8


def test_sharded_stage1_matches_single_device():
    cfg, sc, scene, params, pool, ids, controls = _setup()
    H, W, focal = sc["hwf"]
    mesh = make_ray_mesh()

    # deterministic branch: no noise so single == sharded up to float assoc
    cfg.raw_noise_std = 0.0
    # donate_argnums deletes the input state's buffers: give each state its
    # own copy of the params
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state_a = init_stage1_state(copy(params))
    nerf_a, _ = make_stage1_steps(cfg, H, W, focal)
    state_a, m_a = nerf_a(
        state_a, scene, jnp.asarray(pool), jnp.asarray(ids), controls, 5e-4
    )

    state_b = init_stage1_state(copy(params))
    nerf_b, sampler_b = shard_stage1_steps(cfg, H, W, focal, mesh)
    batch_sh, ids_sh = shard_batch(mesh, jnp.asarray(pool), jnp.asarray(ids))
    state_b, m_b = nerf_b(state_b, scene, batch_sh, ids_sh, controls, 5e-4)

    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
    )
    wa = np.asarray(state_a["params"]["nerf"]["pts"][0]["w"])
    wb = np.asarray(state_b["params"]["nerf"]["pts"][0]["w"])
    np.testing.assert_allclose(wa, wb, atol=2e-6)

    # sampler step must also run sharded
    state_b, m_b2 = sampler_b(state_b, scene, batch_sh, ids_sh, controls, 5e-4)
    assert np.isfinite(float(m_b2["loss"]))


def test_sharded_stage2_runs():
    cfg, sc, scene, params, pool, ids, controls = _setup()
    H, W, focal = sc["hwf"]
    mesh = make_ray_mesh()
    state = init_stage2_state(params)
    step = shard_stage2_step(cfg, H, W, focal, mesh)
    batch_sh, ids_sh = shard_batch(mesh, jnp.asarray(pool), jnp.asarray(ids))
    state, m = step(state, scene, batch_sh, ids_sh, controls, 3e-4)
    assert np.isfinite(float(m["loss"]))
    assert int(state["global_step"]) == 1


def test_multi_scene_training_step():
    """4 scenes x 2-way ray sharding on the 8-dev CPU mesh, one dispatch."""
    from pronerf_tpu.parallel.multi_scene import (
        make_multi_scene_step,
        make_scene_mesh,
        place_scene_batch,
        stack_scenes,
    )
    from pronerf_tpu.train import init_stage1_state

    cfg, _, _, _, _, _, controls = _setup()
    n_scene, n_rand = 4, 64
    scenes, states, batches, idss = [], [], [], []
    H = W = focal = None
    for s in range(n_scene):
        sc = make_scene(n_views=6, H=20, W=24, seed=s)
        H, W, focal = sc["hwf"]
        scenes.append(prepare_scene(sc["images"], sc["poses"], sc["K"]))
        params = init_pronerf_params(jax.random.PRNGKey(s), mmnetdepth=6)
        states.append(init_stage1_state(params))
        rng = np.random.default_rng(s)
        pool, ids = build_ray_pool(
            sc["images"], sc["poses"], sc["K"], list(range(6)), 4, rng
        )
        batches.append(pool[:n_rand])
        idss.append(ids[:n_rand])

    mesh = make_scene_mesh(n_scene, 2)
    assert mesh.devices.shape == (4, 2)
    states_s = stack_scenes(states)
    scenes_s = stack_scenes(scenes)
    batch = jnp.asarray(np.stack(batches))
    ids = jnp.asarray(np.stack(idss))
    batch, ids = place_scene_batch(mesh, batch, ids)

    step = make_multi_scene_step(cfg, H, W, focal, mesh, stage=1, branch="nerf")
    states_s, metrics = step(states_s, scenes_s, batch, ids, controls, 5e-4)
    losses = np.asarray(metrics["loss"])
    assert losses.shape == (n_scene,)
    assert np.all(np.isfinite(losses))
    # scenes differ -> losses differ
    assert len(set(np.round(losses, 6).tolist())) > 1
    assert int(np.asarray(states_s["global_step"])[0]) == 1


def test_multi_scene_sequential_matches_vmap():
    """On a SINGLE-device scene axis the step time-multiplexes scenes via
    ``lax.map`` (vmap materializes every scene's exploration activations
    at once and OOM'd at fern scale — round-5 multi-soak). The sequential
    schedule must train bit-identically to the partitioned vmap path."""
    from pronerf_tpu.parallel.multi_scene import (
        make_multi_scene_step,
        make_scene_mesh,
        place_scene_batch,
        stack_scenes,
    )
    from pronerf_tpu.train import init_stage1_state

    cfg, _, _, _, _, _, controls = _setup()
    n_scene, n_rand = 2, 64
    scenes, states, batches, idss = [], [], [], []
    H = W = focal = None
    for s in range(n_scene):
        sc = make_scene(n_views=6, H=20, W=24, seed=s)
        H, W, focal = sc["hwf"]
        scenes.append(prepare_scene(sc["images"], sc["poses"], sc["K"]))
        params = init_pronerf_params(jax.random.PRNGKey(s), mmnetdepth=6)
        states.append(init_stage1_state(params))
        rng = np.random.default_rng(s)
        pool, ids = build_ray_pool(
            sc["images"], sc["poses"], sc["K"], list(range(6)), 4, rng
        )
        batches.append(pool[:n_rand])
        idss.append(ids[:n_rand])

    outs = {}
    for label, mesh in (
        ("vmap", make_scene_mesh(n_scene, 1)),       # scene axis = 2
        ("seq", make_scene_mesh(1, 1)),              # scene axis = 1
    ):
        states_s = stack_scenes(states)
        scenes_s = stack_scenes(scenes)
        batch = jnp.asarray(np.stack(batches))
        ids = jnp.asarray(np.stack(idss))
        batch, ids = place_scene_batch(mesh, batch, ids)
        step = make_multi_scene_step(cfg, H, W, focal, mesh, 1, "nerf")
        st, metrics = step(states_s, scenes_s, batch, ids, controls, 5e-4)
        outs[label] = (st, np.asarray(metrics["loss"]))

    np.testing.assert_allclose(outs["seq"][1], outs["vmap"][1], rtol=1e-6)
    w_seq = np.asarray(outs["seq"][0]["params"]["nerf"]["pts"][0]["w"])
    w_v = np.asarray(outs["vmap"][0]["params"]["nerf"]["pts"][0]["w"])
    np.testing.assert_allclose(w_seq, w_v, atol=2e-6)


def test_multi_scene_sequential_matches_vmap_stage2():
    """Stage-2 twin of the test above: `train-multi --stage 2` on one chip
    takes the lax.map schedule, and its JOINT step (one Adam over all
    three nets) must match the partitioned vmap path bit-for-bit too.
    (Round 5: the 8-scene fern-scale stage-2 soak NaN'd at iter 500 on
    2/8 scenes; this pins down whether the sequential schedule itself
    diverges from the reference-parity math.)"""
    from pronerf_tpu.parallel.multi_scene import (
        make_multi_scene_step,
        make_scene_mesh,
        place_scene_batch,
        stack_scenes,
    )

    cfg, _, _, _, _, _, controls = _setup()
    n_scene, n_rand = 2, 64
    scenes, states, batches, idss = [], [], [], []
    H = W = focal = None
    for s in range(n_scene):
        sc = make_scene(n_views=6, H=20, W=24, seed=s)
        H, W, focal = sc["hwf"]
        scenes.append(prepare_scene(sc["images"], sc["poses"], sc["K"]))
        params = init_pronerf_params(jax.random.PRNGKey(s), mmnetdepth=6)
        states.append(init_stage2_state(params))
        rng = np.random.default_rng(s)
        pool, ids = build_ray_pool(
            sc["images"], sc["poses"], sc["K"], list(range(6)), 4, rng
        )
        batches.append(pool[:n_rand])
        idss.append(ids[:n_rand])

    outs = {}
    for label, mesh in (
        ("vmap", make_scene_mesh(n_scene, 1)),       # scene axis = 2
        ("seq", make_scene_mesh(1, 1)),              # scene axis = 1
    ):
        states_s = stack_scenes(states)
        scenes_s = stack_scenes(scenes)
        batch = jnp.asarray(np.stack(batches))
        ids = jnp.asarray(np.stack(idss))
        batch, ids = place_scene_batch(mesh, batch, ids)
        step = make_multi_scene_step(cfg, H, W, focal, mesh, 2)
        st, metrics = step(states_s, scenes_s, batch, ids, controls, 3e-4)
        outs[label] = (st, np.asarray(metrics["loss"]))

    assert np.all(np.isfinite(outs["seq"][1]))
    np.testing.assert_allclose(outs["seq"][1], outs["vmap"][1], rtol=1e-6)
    for net in ("nerf", "sampler", "refine"):
        leaves_s = jax.tree_util.tree_leaves(outs["seq"][0]["params"][net])
        leaves_v = jax.tree_util.tree_leaves(outs["vmap"][0]["params"][net])
        for a, b in zip(leaves_s, leaves_v):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6
            )


def test_multi_scene_pooled_step_matches_batch_step():
    """The device-resident-pool step (what train-multi drives) must train
    exactly like the batch-shipping step on the same slice, and the
    per-scene pool reshuffle must draw INDEPENDENT permutations."""
    from pronerf_tpu.parallel.multi_scene import (
        make_multi_scene_pooled_step,
        make_multi_scene_step,
        make_scene_mesh,
        place_scene_batch,
        place_scene_pools,
        reshuffle_scene_pools,
        stack_scenes,
    )
    from pronerf_tpu.train import init_stage1_state

    cfg, _, _, _, _, _, controls = _setup()
    n_scene, n_rand = 2, 64
    cfg.N_rand = n_rand
    scenes, states, pools_l, ids_l = [], [], [], []
    H = W = focal = None
    for s in range(n_scene):
        sc = make_scene(n_views=6, H=20, W=24, seed=s)
        H, W, focal = sc["hwf"]
        scenes.append(prepare_scene(sc["images"], sc["poses"], sc["K"]))
        params = init_pronerf_params(jax.random.PRNGKey(s), mmnetdepth=6)
        states.append(init_stage1_state(params))
        rng = np.random.default_rng(s)
        pool, ids = build_ray_pool(
            sc["images"], sc["poses"], sc["K"], list(range(6)), 4, rng
        )
        pools_l.append(pool[: 3 * n_rand])
        ids_l.append(ids[: 3 * n_rand])

    mesh = make_scene_mesh(n_scene, 1)
    scenes_s = stack_scenes(scenes)
    pools = np.stack(pools_l)
    idss = np.stack(ids_l)

    # batch-shipping step on slice [n_rand : 2*n_rand]
    states_a = stack_scenes(states)
    batch, ids = place_scene_batch(
        mesh,
        jnp.asarray(pools[:, n_rand : 2 * n_rand]),
        jnp.asarray(idss[:, n_rand : 2 * n_rand]),
    )
    step_a = make_multi_scene_step(cfg, H, W, focal, mesh, 1, "nerf")
    _, metrics_a = step_a(states_a, scenes_s, batch, ids, controls, 5e-4)

    # pooled step slicing the same window in-graph
    states_b = stack_scenes(states)
    pools_d, ids_d = place_scene_pools(
        mesh, jnp.asarray(pools), jnp.asarray(idss)
    )
    step_b = make_multi_scene_pooled_step(cfg, H, W, focal, mesh, 1, "nerf")
    _, metrics_b = step_b(
        states_b, scenes_s, pools_d, ids_d, jnp.int32(n_rand), controls,
        5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(metrics_a["loss"]), np.asarray(metrics_b["loss"]),
        atol=1e-6, rtol=0,
    )

    # per-scene reshuffle: each scene permuted, with DIFFERENT permutations
    sp, si = reshuffle_scene_pools(pools_d, ids_d, jax.random.PRNGKey(5))
    sp, si = np.asarray(sp), np.asarray(si)
    for s in range(n_scene):
        np.testing.assert_array_equal(
            np.sort(sp[s].ravel()), np.sort(pools[s].ravel())
        )
    # identical inputs across scenes -> the drawn permutations must differ
    m = pools.shape[1]
    same_ids = jnp.tile(jnp.arange(m, dtype=jnp.int32)[None], (n_scene, 1))
    same_pools = jnp.zeros((n_scene, m, 3, 3), jnp.float32)
    _, perms = reshuffle_scene_pools(
        same_pools, same_ids, jax.random.PRNGKey(6)
    )
    perms = np.asarray(perms)
    assert not np.array_equal(perms[0], perms[1])
    np.testing.assert_array_equal(np.sort(perms[0]), np.arange(m))


def test_sharded_frame_renderer_matches_single_device():
    """Serving SPMD: the ray-sharded whole-frame render must equal the
    single-device renderer (deterministic inference graph, replicated
    scene/params -> identical neighbor selection per shard)."""
    from pronerf_tpu.models import RenderStatics
    from pronerf_tpu.parallel import make_sharded_frame_renderer
    from pronerf_tpu.render.renderer import make_frame_renderer

    sc = make_scene(n_views=6, H=20, W=24, seed=0)
    H, W, _ = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    statics = RenderStatics.infer()
    mesh = make_ray_mesh()

    single = make_frame_renderer(statics, H, W, sc["K"], tile_rays=0)
    sharded = make_sharded_frame_renderer(statics, H, W, sc["K"], mesh)

    c2w = jnp.asarray(sc["poses"][1])
    a = single(params, scene, c2w)
    b = sharded(params, scene, c2w)
    for k in ("rgb1", "rgb0", "depth"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), atol=2e-6
        )


def test_sharded_frame_renderer_shipped_serving_statics():
    """Multi-device equality for the config that SHIPS — `infer --use-trt`
    (round-3 default): row-major fused Pallas NeRF kernel, u8-packed corner
    gather, windowed epipolar gather, whole-frame dispatch. Round-4 verdict
    gap: sharded == single-device was proven only for plain-XLA defaults
    and the non-default transposed variant, never for the released serving
    graph. The statics here are built by the SAME code path the CLI uses
    (`render.infer._infer_statics` on the fern_trt config with the
    `--use-trt` defaults), not hand-assembled.

    CPU caveat (also hit by the transposed test above): XLA:CPU's
    shard_map dot thunk lacks bf16, so when the bf16 graph fails to lower
    here we fall back to compute_dtype=None with every OTHER shipped flag
    intact — shard slicing is per-ray and dtype-independent, and the
    bf16-vs-f32 axis is equality-tested single-device in
    test_transposed.py / test_fused_kernel.py. On TPU the bf16 graph
    shards identically."""
    import dataclasses

    from pronerf_tpu.cli import DEFAULT_TRT_CONFIG
    from pronerf_tpu.config import Config
    from pronerf_tpu.parallel import make_sharded_frame_renderer
    from pronerf_tpu.render.infer import _infer_statics
    from pronerf_tpu.render.renderer import make_frame_renderer

    cfg = Config.from_file(
        DEFAULT_TRT_CONFIG,
        datadir="synthetic", use_trt=True, tile_rays=0, use_pallas=True,
    )
    statics = _infer_statics(cfg, use_bf16=True)
    assert statics.use_pallas and not statics.transposed
    assert statics.compute_dtype == "bfloat16"

    sc = make_scene(n_views=6, H=20, W=24, seed=0)
    H, W, _ = sc["hwf"]
    # u8 corner pack: exactly what run_inference feeds prepare_scene
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"],
                          pack_corners="u8")
    params = init_pronerf_params(jax.random.PRNGKey(0))
    mesh = make_ray_mesh()
    c2w = jnp.asarray(sc["poses"][1])

    # Two variants: the shipped auto windowed-gather resolution, and the
    # window path FORCED on (auto picks unwindowed below the staging
    # cliff, i.e. at this tiny scale; windowing needs BOTH tiles and a
    # band height — renderer.resolve_gather_statics sets both at full res).
    variants = [
        ("shipped-auto", statics),
        ("windowed", dataclasses.replace(
            statics, gather_tiles=4, gather_window_rows=8)),
    ]
    for name, st in variants:
        for dtype_try in ("bfloat16", None):
            st_try = dataclasses.replace(st, compute_dtype=dtype_try)
            single = make_frame_renderer(st_try, H, W, sc["K"], tile_rays=0)
            sharded = make_sharded_frame_renderer(st_try, H, W, sc["K"], mesh)
            try:
                # materialize INSIDE the try: the CPU bf16 failure is
                # async and only surfaces at host readback
                a = {k: np.asarray(v)
                     for k, v in single(params, scene, c2w).items()}
                b = {k: np.asarray(v)
                     for k, v in sharded(params, scene, c2w).items()}
            except Exception:
                if dtype_try == "bfloat16":
                    continue  # XLA:CPU bf16 shard_map gap; f32 must pass
                raise
            for k in ("rgb1", "rgb0", "depth"):
                np.testing.assert_allclose(
                    a[k], b[k], atol=2e-6,
                    err_msg=f"{name} dtype={dtype_try} key={k}",
                )
            break


def test_sharded_frame_renderer_transposed_matches_single_device():
    """The transposed serving pipeline (models/pronerf_t.py) is also
    numerically shard-count independent: every per-ray op is identical
    across shard slicing, so sharded == single-device holds as tightly as
    for the row-major graph."""
    from pronerf_tpu.models import RenderStatics
    from pronerf_tpu.parallel import make_sharded_frame_renderer
    from pronerf_tpu.render.renderer import make_frame_renderer

    sc = make_scene(n_views=6, H=20, W=24, seed=0)
    H, W, _ = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    # f32 kernels: XLA:CPU's shard_map dot thunk lacks bf16 support (the
    # bf16 transposed graph is equality-tested single-device in
    # test_transposed.py; on TPU both dtypes shard identically)
    statics = RenderStatics.infer(
        compute_dtype=None, use_pallas=True, transposed=True,
        pallas_block_rays=128,
    )
    mesh = make_ray_mesh()

    single = make_frame_renderer(statics, H, W, sc["K"], tile_rays=0)
    sharded = make_sharded_frame_renderer(statics, H, W, sc["K"], mesh)

    c2w = jnp.asarray(sc["poses"][1])
    a = single(params, scene, c2w)
    b = sharded(params, scene, c2w)
    for k in ("rgb1", "rgb0", "depth"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), atol=2e-6
        )
