import numpy as np
import jax
import jax.numpy as jnp

from pronerf_tpu.models import (
    count_params,
    init_minmax_mlp,
    init_nerf_mlp,
    init_pronerf_params,
    minmax_mlp_apply,
    nerf_mlp_apply,
    render_rays,
    RenderStatics,
)
from pronerf_tpu.render import prepare_scene, rays_for_pose
from pronerf_tpu.utils.synthetic import make_scene


def test_nerf_mlp_shapes_and_param_count():
    params = init_nerf_mlp(jax.random.PRNGKey(0))
    x = jnp.zeros((5, 7, 63))
    d = jnp.zeros((5, 7, 27))
    out = nerf_mlp_apply(params, x, d)
    assert out.shape == (5, 7, 4)
    # Reference operating point: 8x256 skip@4 NeRF ~= 595k params.
    n = count_params(params)
    assert 590_000 < n < 600_000, n


def test_minmax_mlp_param_counts():
    sampler = init_minmax_mlp(jax.random.PRNGKey(1), 6, 256, 288, 27)
    refine = init_minmax_mlp(jax.random.PRNGKey(2), 6, 256, 144, 35)
    # sampler ~410k, refine ~375k (SURVEY.md §6)
    assert 400_000 < count_params(sampler) < 420_000
    assert 365_000 < count_params(refine) < 385_000
    out = minmax_mlp_apply(sampler, jnp.zeros((3, 288)))
    assert out.shape == (3, 27)


def test_nerf_skip_reinjects_input():
    """The skip concat must make the output sensitive to the raw encoded
    input at layer 5, not just through layer-0."""
    params = init_nerf_mlp(jax.random.PRNGKey(0))
    # Zero layer-0 weights: without the skip the whole pts branch would be
    # constant in x; with the skip, layer 5 still sees x.
    params["pts"][0]["w"] = jnp.zeros_like(params["pts"][0]["w"])
    x1 = jnp.ones((1, 63))
    x2 = -jnp.ones((1, 63))
    d = jnp.zeros((1, 27))
    o1 = nerf_mlp_apply(params, x1, d)
    o2 = nerf_mlp_apply(params, x2, d)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def _tiny_setup(seed=0):
    sc = make_scene(n_views=6, H=24, W=30, seed=seed)
    H, W, focal = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(seed))
    rays = rays_for_pose(H, W, sc["K"], sc["poses"][0])
    n = 64
    rays = {k: v[:n] for k, v in rays.items()}
    rays["pose_id"] = jnp.zeros((n,), jnp.int32)
    controls = {
        "rng": jax.random.PRNGKey(7),
        "n_mult": jnp.int32(3),
        "dir_expand": jnp.asarray(True),
        "dir_jitter": jnp.asarray(False),
        "neighbor_subset": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "target_t": scene["poses_t"][0],
    }
    return params, rays, scene, controls


def test_pipeline_all_branches_finite():
    params, rays, scene, controls = _tiny_setup()
    for statics in [
        RenderStatics.stage1_nerf(),
        RenderStatics.stage1_sampler(),
        RenderStatics.stage1_sampler(randomize=False),
        RenderStatics.stage2(),
        RenderStatics.stage2(randomize=False),
        RenderStatics.infer(),
    ]:
        out = render_rays(params, rays, scene, controls, statics)
        for k in ("rgb0", "rgb1", "mm_rgb"):
            v = np.asarray(out[k])
            assert np.all(np.isfinite(v)), (k, statics)
            assert v.shape == (64, 3)
        assert np.all(np.isfinite(np.asarray(out["depth"])))


def test_stage1_nerf_branch_blocks_sampler_grads():
    params, rays, scene, controls = _tiny_setup()
    target = jnp.full((64, 3), 0.5)

    def loss_fn(p, statics):
        out = render_rays(p, rays, scene, controls, statics)
        return jnp.mean((out["rgb1"] - target) ** 2)

    g_nerf = jax.grad(loss_fn)(params, RenderStatics.stage1_nerf(noise_std=0.0))
    # sampler/refine grads must be exactly zero on the NeRF branch
    for net in ("sampler", "refine"):
        total = sum(
            float(jnp.sum(jnp.abs(x)))
            for x in jax.tree_util.tree_leaves(g_nerf[net])
        )
        assert total == 0.0, net
    nerf_total = sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree_util.tree_leaves(g_nerf["nerf"])
    )
    assert nerf_total > 0.0


def test_stage1_sampler_branch_grads_flow_everywhere():
    params, rays, scene, controls = _tiny_setup()
    target = jnp.full((64, 3), 0.5)

    def loss_fn(p):
        out = render_rays(
            p, rays, scene, controls, RenderStatics.stage1_sampler()
        )
        return (
            jnp.mean((out["rgb1"] - target) ** 2)
            + jnp.mean((out["rgb0"] - target) ** 2)
            + jnp.mean((out["mm_rgb"] - target) ** 2)
        )

    g = jax.grad(loss_fn)(params)
    for net in ("nerf", "sampler", "refine"):
        total = sum(
            float(jnp.sum(jnp.abs(x)))
            for x in jax.tree_util.tree_leaves(g[net])
        )
        assert total > 0.0, net


def test_explore_branch_shapes():
    params, rays, scene, controls = _tiny_setup()
    out = render_rays(
        params, rays, scene, controls, RenderStatics.stage1_nerf()
    )
    assert out["weights"].shape == (64, 64)  # expanded to max 64 slots
    out2 = render_rays(
        params, rays, scene, controls, RenderStatics.infer()
    )
    assert out2["weights"].shape == (64, 8)


def test_pipeline_jit_and_nmult_traced():
    """One compiled graph must serve every n_mult without retracing."""
    params, rays, scene, controls = _tiny_setup()
    statics = RenderStatics.stage1_nerf()
    fn = jax.jit(
        lambda p, r, s, c: render_rays(p, r, s, c, statics)
    )
    o1 = fn(params, rays, scene, controls)
    controls2 = dict(controls, n_mult=jnp.int32(8))
    o2 = fn(params, rays, scene, controls2)
    assert np.all(np.isfinite(np.asarray(o2["rgb1"])))
    assert fn._cache_size() == 1


def test_donerf_family():
    from pronerf_tpu.models.donerf import (
        auto_skip, donerf_apply, init_donerf, parse_skip_grammar,
    )
    from pronerf_tpu.models import render_rays as rr

    locs = parse_skip_grammar("0::63-7:63:", 90)
    assert locs == {0: (0, 63), 7: (63, 90)}
    assert auto_skip(8) == "0::63-7:63:"

    params = init_donerf(jax.random.PRNGKey(0))
    x = jnp.ones((6, 5, 63))
    d = jnp.ones((6, 5, 27))
    out = donerf_apply(params, x, d)
    assert out.shape == (6, 5, 4)
    # view direction must influence the output (injected at layer 7)
    out2 = donerf_apply(params, x, -d)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_pipeline_donerf_arch():
    from pronerf_tpu.models import init_pronerf_params as initp

    _, rays, scene, controls = _tiny_setup()
    params = initp(jax.random.PRNGKey(0), netarch="donerf")
    out = render_rays(
        params, rays, scene, controls,
        RenderStatics.infer(netarch="donerf"),
    )
    assert np.all(np.isfinite(np.asarray(out["rgb1"])))


def test_render_determinism():
    """Same seeds -> bitwise-identical render (replaces the reference's
    pytest=True seeded-noise fixtures, SURVEY.md §4)."""
    params, rays, scene, controls = _tiny_setup()
    statics = RenderStatics.stage1_nerf()  # noisiest branch
    a = render_rays(params, rays, scene, controls, statics)
    b = render_rays(params, rays, scene, controls, statics)
    np.testing.assert_array_equal(np.asarray(a["rgb1"]), np.asarray(b["rgb1"]))
    # different rng key -> different noise
    c2 = dict(controls, rng=jax.random.PRNGKey(99))
    c = render_rays(params, rays, scene, c2, statics)
    assert not np.array_equal(np.asarray(a["rgb1"]), np.asarray(c["rgb1"]))


def test_neighbor_selection_excludes_own_view_under_coincident_poses():
    """The ray's own view must never be selected as a source view, even
    when another training pose coincides exactly with it (argsort tie) —
    exclusion is by index, not by distance-sort position."""
    from pronerf_tpu.models.pronerf import _select_neighbors

    sc = make_scene(n_views=6, H=24, W=30, seed=0)
    poses = np.asarray(sc["poses"]).copy()
    poses[1] = poses[0]  # coincident translation with view 0
    scene = prepare_scene(sc["images"], poses, sc["K"])
    n = 16
    rays = rays_for_pose(*[sc["hwf"][0], sc["hwf"][1]], sc["K"], poses[0])
    rays = {k: v[:n] for k, v in rays.items()}
    controls = {"neighbor_subset": jnp.asarray([0, 1, 2, 3], jnp.int32)}
    statics = RenderStatics.stage1_sampler()
    for own in (0, 1):
        rays["pose_id"] = jnp.full((n,), own, jnp.int32)
        idx = np.asarray(_select_neighbors(statics, rays, scene, controls))
        assert idx.shape == (n, 4)
        assert not np.any(idx == own), (own, idx[0])
