"""Cross-implementation parity: run the REFERENCE (PyTorch, CPU) as an
oracle on identical weights/inputs and compare our JAX pipeline against it
numerically. Skipped when /root/reference is not present.

The reference modules need two harness shims on a CUDA-less machine: a
torchvision stub (imported only by dead ResUNet code) and a dummy
torch.cuda.Event (unguarded timing objects at driver module level)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="no reference tree")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    torch.cuda.Event = lambda **kw: None  # dummy (driver makes them at import)
    sys.path.insert(0, str(REF))
    import inverse_warp as ref_warp
    import run_nerf_helpers as ref_helpers

    return types.SimpleNamespace(warp=ref_warp, helpers=ref_helpers)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


# ---------------------------------------------------------------- encodings


def test_positional_encoding_matches(ref):
    import jax.numpy as jnp

    from pronerf_tpu.ops.encoding import positional_encoding

    embed, out_dim = ref.helpers.get_embedder(10, 0)
    x = np.random.default_rng(0).normal(size=(40, 3)).astype(np.float32)
    theirs = embed(_t(x)).numpy()
    ours = np.asarray(positional_encoding(jnp.asarray(x), 10))
    assert out_dim == ours.shape[-1] == 63
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_plucker_matches(ref):
    import jax.numpy as jnp

    from pronerf_tpu.ops.encoding import plucker

    rng = np.random.default_rng(1)
    o = rng.normal(size=(30, 3)).astype(np.float32)
    d = rng.normal(size=(30, 3)).astype(np.float32)
    theirs = ref.helpers.Pluecker()(_t(o), _t(d)).numpy()
    ours = np.asarray(plucker(jnp.asarray(o), jnp.asarray(d)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_rays_and_ndc_match(ref):
    import jax.numpy as jnp

    from pronerf_tpu.ops.rays import get_rays, ndc_rays

    H, W, f = 14, 18, 21.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(3, 4, dtype=np.float32)
    c2w[:, 3] = [0.2, -0.1, 0.3]
    ro_t, rd_t = ref.helpers.get_rays(H, W, _t(K), _t(c2w))
    ro_j, rd_j = get_rays(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro_j), ro_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd_j), rd_t.numpy(), atol=1e-5)
    no_t, nd_t = ref.helpers.ndc_rays(H, W, f, 1.0, ro_t, rd_t)
    no_j, nd_j = ndc_rays(H, W, f, 1.0, ro_j, rd_j)
    np.testing.assert_allclose(np.asarray(no_j), no_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nd_j), nd_t.numpy(), atol=1e-5)


# ------------------------------------------------------------------ models


def _load_nerf_into_torch(ref, params):
    m = ref.helpers.NeRF(
        D=8, W=256, input_ch=63, input_ch_views=27, output_ch=4,
        skips=[4], use_viewdirs=True,
    )
    sd = m.state_dict()
    for i, layer in enumerate(params["pts"]):
        sd[f"pts_linears.{i}.weight"] = _t(np.asarray(layer["w"]).T)
        sd[f"pts_linears.{i}.bias"] = _t(layer["b"])
    for ours_key, theirs in [
        ("alpha", "alpha_linear"), ("feature", "feature_linear"),
        ("views", "views_linears.0"), ("rgb", "rgb_linear"),
    ]:
        sd[f"{theirs}.weight"] = _t(np.asarray(params[ours_key]["w"]).T)
        sd[f"{theirs}.bias"] = _t(params[ours_key]["b"])
    m.load_state_dict(sd)
    return m.eval()


def _load_minmax_into_torch(ref, params, in_ch, out_ch):
    m = ref.helpers.MinMaxRay_Net(
        D=6, W=256, input_ch=in_ch, output_ch=out_ch, skips=[1000]
    )
    sd = m.state_dict()
    for i, layer in enumerate(params["layers"]):
        sd[f"fc_backbone.{i}.weight"] = _t(np.asarray(layer["w"]).T)
        sd[f"fc_backbone.{i}.bias"] = _t(layer["b"])
    sd["fc_output.weight"] = _t(np.asarray(params["out"]["w"]).T)
    sd["fc_output.bias"] = _t(params["out"]["b"])
    m.load_state_dict(sd)
    return m.eval()


def test_nerf_mlp_forward_matches(ref):
    import jax

    from pronerf_tpu.models.mlp import init_nerf_mlp, nerf_mlp_apply

    params = init_nerf_mlp(jax.random.PRNGKey(0))
    m = _load_nerf_into_torch(ref, params)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(50, 63)).astype(np.float32)
    d = rng.normal(size=(50, 27)).astype(np.float32)
    with torch.no_grad():
        theirs = m(torch.cat([_t(x), _t(d)], -1)).numpy()
    import jax.numpy as jnp

    ours = np.asarray(nerf_mlp_apply(params, jnp.asarray(x), jnp.asarray(d)))
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_minmax_mlp_forward_matches(ref):
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models.mlp import init_minmax_mlp, minmax_mlp_apply

    params = init_minmax_mlp(jax.random.PRNGKey(1), 6, 256, 288, 27)
    m = _load_minmax_into_torch(ref, params, 288, 27)
    x = np.random.default_rng(3).normal(size=(40, 288)).astype(np.float32)
    with torch.no_grad():
        theirs = m(_t(x)).numpy()
    ours = np.asarray(minmax_mlp_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


# ------------------------------------------------------------------- warp


def test_epipolar_warp_matches_reference(ref):
    """Our fused-matrix projection + packed-u8 gather vs the reference's
    training warp (bmm + grid_sample) on identical geometry."""
    import jax.numpy as jnp

    from pronerf_tpu.ops.rays import get_rays_np
    from pronerf_tpu.ops.warp import epipolar_colors, fuse_projection
    from pronerf_tpu.render.raygen import prepare_scene
    from pronerf_tpu.utils.synthetic import make_consistent_scene

    sc = make_consistent_scene(n_views=3, H=22, W=28, seed=4)
    H, W, _ = sc["hwf"]
    K = sc["K"]
    n, S = 64, 4
    rng = np.random.default_rng(0)
    ro, rd = get_rays_np(H, W, K, sc["poses"][0])
    jj = rng.integers(0, H, n)
    ii = rng.integers(0, W, n)
    rays_o = ro[jj, ii].astype(np.float32)
    rays_d = rd[jj, ii].astype(np.float32)
    z3d = np.sort(
        rng.uniform(1.0, 8.0, size=(n, S)).astype(np.float32), axis=-1
    )
    src_view = 2

    # reference: img [B,3,H,W] tiled over samples; depth [B,1,N]; ro/rd [B,3,N]
    B = S
    img = _t(sc["images"][src_view]).permute(2, 0, 1)[None].repeat(B, 1, 1, 1)
    depth = _t(z3d.T[:, None, :])  # [S,1,n] -> but ref wants [B,H,W]
    depth = _t(z3d.T).reshape(B, 1, n)
    ro1 = _t(rays_o.T)[None].repeat(B, 1, 1)
    rd1 = _t(rays_d.T)[None].repeat(B, 1, 1)
    pose = _t(sc["poses"][src_view])[None].repeat(B, 1, 1)
    K_t = _t(K)[None].repeat(B, 1, 1)
    with torch.no_grad():
        warped, _ = ref.warp.inverse_warp_rod1_rt2_coords(
            img, depth.reshape(B, 1, n), ro1, rd1, pose, K_t,
            torch.inverse(K_t), padding_mode="zeros",
        )
    theirs = warped.reshape(B, 3, n).permute(2, 0, 1).numpy()  # [n, S, 3]

    scene = prepare_scene(sc["images"], sc["poses"], K)  # u8-packed
    ours = np.asarray(
        epipolar_colors(
            scene["images"], scene["fused_mats"], jnp.asarray(K),
            jnp.full((n, 1), src_view, jnp.int32),
            jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(z3d),
        )
    )[:, 0]  # [n, S, 3]

    # u8 quantization bounds the delta at ~1/255 per corner
    close = np.abs(ours - theirs) < 0.02
    assert close.mean() > 0.97, close.mean()


# -------------------------------------------------------------- composite


def test_raw2outputs_matches_reference(ref):
    import importlib
    import jax.numpy as jnp

    from pronerf_tpu.ops.composite import composite

    base = importlib.import_module("run_S_eS_eN_alter_base")
    rng = np.random.default_rng(5)
    N, S = 24, 8
    raw = rng.normal(0, 3, size=(N, S, 4)).astype(np.float32)
    z = np.sort(rng.uniform(0, 1, size=(N, S)), -1).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    add = rng.normal(size=(N, S)).astype(np.float32)
    mul = rng.normal(size=(N, S)).astype(np.float32)

    with torch.no_grad():
        rgb_t, disp_t, acc_t, w_t, depth_t = base.raw2outputs(
            _t(raw), _t(z), _t(d), raw_noise_std=0, white_bkgd=False,
            mm_density_add=_t(add), mm_density_mul=_t(mul),
        )
    ours = composite(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d),
        mm_add=jnp.asarray(add), mm_mul=jnp.asarray(mul), clamp_raw=True,
    )
    np.testing.assert_allclose(np.asarray(ours["rgb"]), rgb_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["depth"]), depth_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["acc"]), acc_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["weights"]), w_t.numpy(), atol=2e-5)


# ------------------------------------------------- full pipeline (eval mode)


def test_full_render_rays_matches_reference(ref):
    """End-to-end render_rays parity in deterministic eval mode: identical
    weights, scene, and rays through both implementations (float corner
    path so the only deltas are float reassociation)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import RenderStatics, init_pronerf_params, render_rays
    from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose
    from pronerf_tpu.utils.synthetic import make_consistent_scene

    base = importlib.import_module("run_S_eS_eN_alter_base")
    sc = make_consistent_scene(n_views=5, H=20, W=26, seed=6)
    H, W, _ = sc["hwf"]
    K = sc["K"]
    V = 2  # neighbors
    n = 48

    params = init_pronerf_params(jax.random.PRNGKey(3), num_neighbor=V)
    nerf_t = _load_nerf_into_torch(ref, params["nerf"])
    sampler_t = _load_minmax_into_torch(ref, params["sampler"], 288, 27)
    refine_t = _load_minmax_into_torch(
        ref, params["refine"], 6 * 8 + 3 * V * 8, 35
    )

    # --- ours ---
    scene = prepare_scene(
        sc["images"][:4], sc["poses"][:4], K, pack_corners=False
    )
    rays = rays_for_pose(H, W, K, sc["poses"][4])
    rays = {k: v[:n] for k, v in rays.items()}
    controls = {
        "rng": jax.random.PRNGKey(0),
        "target_t": jnp.asarray(sc["poses"][4][:3, 3]),
    }
    statics = RenderStatics.stage1_sampler(randomize=False, num_neighbor=V)
    ours = render_rays(params, rays, scene, controls, statics)

    # --- theirs ---
    embed_fn, _ = ref.helpers.get_embedder(10, 0)
    embeddirs_fn, _ = ref.helpers.get_embedder(4, 0)

    def network_query_fn(inputs, viewdirs, fn):
        return base.run_network(
            inputs, viewdirs, fn, embed_fn, embeddirs_fn, netchunk=65536
        )

    ray_batch = torch.cat(
        [
            _t(rays["ndc_o"]), _t(rays["ndc_d"]),
            torch.full((n, 1), 1e-6), torch.full((n, 1), 1.0),
            _t(rays["viewdirs"]),
        ],
        -1,
    )
    or_ray_batch = torch.cat(
        [
            _t(rays["or_o"]), _t(rays["or_d"]),
            torch.full((n, 1), 1.0), torch.full((n, 1), 10.0),
            _t(rays["viewdirs"]),
        ],
        -1,
    )
    with torch.no_grad():
        theirs = base.render_rays(
            ray_batch, or_ray_batch,
            network_fn=nerf_t,
            network_query_fn=network_query_fn,
            N_samples=8,
            raw_noise_std=0.0,
            min_max_ray_net=sampler_t,
            refine_net=refine_t,
            N_point_ray_enc=48,
            embed_fn=embed_fn,
            embeddirs_fn=embeddirs_fn,
            randomize=False,
            train_sampler=True,
            train_nerf=True,
            embed_rays=ref.helpers.Pluecker(),
            num_neighbor=V,
            images=_t(sc["images"][:4]),
            poses=_t(sc["poses"][:4]),
            ref_K=_t(K),
            target_pose=_t(sc["poses"][4]),
            batch_rays_nearest_id=torch.zeros(n, V + 1),
        )
    np.testing.assert_allclose(
        np.asarray(ours["mm_rgb"]), theirs["mm_rgb"].numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours["rgb0"]), theirs["rgb_map0"].numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours["rgb1"]), theirs["rgb_map1"].numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours["depth"]), theirs["depth_map"].numpy(), atol=1e-3
    )


def test_stage2_render_rays_matches_reference(ref):
    """Stage-2 eval parity: near=0, NDC eps 1e-5, [v,s,c] epipolar layout,
    offsets always added, no clamp (run_S_eS_eN_alter_base_refine2)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import RenderStatics, init_pronerf_params, render_rays
    from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose
    from pronerf_tpu.utils.synthetic import make_consistent_scene

    s2 = importlib.import_module("run_S_eS_eN_alter_base_refine2")
    sc = make_consistent_scene(n_views=5, H=20, W=26, seed=7)
    H, W, _ = sc["hwf"]
    K = sc["K"]
    V, n = 2, 40

    params = init_pronerf_params(jax.random.PRNGKey(4), num_neighbor=V)
    nerf_t = _load_nerf_into_torch(ref, params["nerf"])
    sampler_t = _load_minmax_into_torch(ref, params["sampler"], 288, 27)
    refine_t = _load_minmax_into_torch(
        ref, params["refine"], 6 * 8 + 3 * V * 8, 35
    )

    scene = prepare_scene(
        sc["images"][:4], sc["poses"][:4], K, pack_corners=False
    )
    rays = rays_for_pose(H, W, K, sc["poses"][4])
    rays = {k: v[:n] for k, v in rays.items()}
    controls = {
        "rng": jax.random.PRNGKey(0),
        "target_t": jnp.asarray(sc["poses"][4][:3, 3]),
    }
    ours = render_rays(
        params, rays, scene, controls,
        RenderStatics.stage2(randomize=False, num_neighbor=V),
    )

    embed_fn, _ = ref.helpers.get_embedder(10, 0)
    embeddirs_fn, _ = ref.helpers.get_embedder(4, 0)

    def network_query_fn(inputs, viewdirs, fn):
        return s2.run_network(
            inputs, viewdirs, fn, embed_fn, embeddirs_fn, netchunk=65536
        )

    ray_batch = torch.cat(
        [
            _t(rays["ndc_o"]), _t(rays["ndc_d"]),
            torch.full((n, 1), 0.0), torch.full((n, 1), 1.0),
            _t(rays["viewdirs"]),
        ],
        -1,
    )
    or_ray_batch = torch.cat(
        [
            _t(rays["or_o"]), _t(rays["or_d"]),
            torch.full((n, 1), 1.0), torch.full((n, 1), 10.0),
            _t(rays["viewdirs"]),
        ],
        -1,
    )
    with torch.no_grad():
        theirs = s2.render_rays(
            ray_batch, or_ray_batch,
            network_fn=nerf_t,
            network_query_fn=network_query_fn,
            N_samples=8,
            network_fine=nerf_t,
            raw_noise_std=1.0,  # gated off by train_nerf=False
            min_max_ray_net=sampler_t,
            refine_net=refine_t,
            N_point_ray_enc=48,
            embed_fn=embed_fn,
            embeddirs_fn=embeddirs_fn,
            randomize=False,
            train_nerf=False,
            embed_rays=ref.helpers.Pluecker(),
            num_neighbor=V,
            images=_t(sc["images"][:4]),
            poses=_t(sc["poses"][:4]),
            ref_K=_t(K),
            target_pose=_t(sc["poses"][4]),
        )
    np.testing.assert_allclose(
        np.asarray(ours["rgb1"]), theirs["rgb_map1"].numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours["depth"]), theirs["depth_map"].numpy(), atol=1e-3
    )


def test_stage2_loss_topology_matches_reference(ref):
    """Attribution for the rehearsal's rgb0 collapse (rehearsal_fern.json:
    eval_psnr_rgb0 8.82 vs rgb1 29.37): with the release config's
    a_mmrgb = 0 (configs/llff/fern/fern_refine.txt:20), the stage-2 loss
    is mse(rgb1) only (run_S_eS_eN_alter_base_refine2.py:859-866), so the
    refine net's RGB head and the sampler's mm_rgb head receive EXACTLY
    ZERO gradient while their shared trunks keep moving under the
    depth/offset gradients — rgb0 drifts unsupervised by construction.

    Verified in BOTH frameworks on identical weights/inputs: the zero
    columns/rows of the output-layer gradient match, and with
    a_mmrgb = 1e-3 the full stage-2 gradients match numerically."""
    import importlib

    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import (
        RenderStatics,
        init_pronerf_params,
        render_rays,
    )
    from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose
    from pronerf_tpu.utils.synthetic import make_consistent_scene

    s2 = importlib.import_module("run_S_eS_eN_alter_base_refine2")
    sc = make_consistent_scene(n_views=5, H=20, W=26, seed=9)
    H, W, _ = sc["hwf"]
    K = sc["K"]
    V, n, S = 2, 32, 8

    params = init_pronerf_params(jax.random.PRNGKey(6), num_neighbor=V)
    # At fresh-init scale the composite can be DEAD (alpha needs sigma +
    # mm_add > 0 AND mm_mul > 0 at the same slot; relu kills both factors
    # for this seed), which would make every gradient assertion vacuous.
    # Boost the density-head biases so compositing is alive, THEN mirror
    # the weights into torch.
    params["sampler"]["out"]["b"] = (
        params["sampler"]["out"]["b"].at[S: 3 * S].add(0.5)
    )
    params["nerf"]["alpha"]["b"] = params["nerf"]["alpha"]["b"] + 0.5
    nerf_t = _load_nerf_into_torch(ref, params["nerf"]).train()
    sampler_t = _load_minmax_into_torch(ref, params["sampler"], 288, 27).train()
    refine_t = _load_minmax_into_torch(
        ref, params["refine"], 6 * 8 + 3 * V * 8, 35
    ).train()

    scene = prepare_scene(
        sc["images"][:4], sc["poses"][:4], K, pack_corners=False
    )
    rays = rays_for_pose(H, W, K, sc["poses"][4])
    rays = {k: v[:n] for k, v in rays.items()}
    target = jnp.asarray(sc["images"][4].reshape(-1, 3)[:n])
    controls = {
        "rng": jax.random.PRNGKey(0),
        "target_t": jnp.asarray(sc["poses"][4][:3, 3]),
    }
    statics = RenderStatics.stage2(randomize=False, num_neighbor=V)

    def loss_fn(p, a_mmrgb):
        out = render_rays(p, rays, scene, controls, statics)
        img = jnp.mean((out["rgb1"] - target) ** 2)
        aux = (
            jnp.mean((out["rgb0"] - target) ** 2)
            + jnp.mean((out["mm_rgb"] - target) ** 2)
        )
        return img + a_mmrgb * aux

    g0 = jax.grad(loss_fn)(params, 0.0)
    # Liveness guard: the boosted graph must actually composite something,
    # or the zero-pattern assertions below prove nothing.
    assert np.abs(np.asarray(g0["nerf"]["rgb"]["w"])).max() > 1e-6
    # a_mmrgb = 0: the rgb heads (refine out cols 4S:, sampler out cols
    # 3S:) get EXACTLY zero grad; the depth/offset/mm-term heads do not.
    r_out = np.asarray(g0["refine"]["out"]["w"])  # [in, 35]
    s_out = np.asarray(g0["sampler"]["out"]["w"])  # [in, 27]
    assert np.all(r_out[:, 4 * S:] == 0.0) and np.all(
        np.asarray(g0["refine"]["out"]["b"])[4 * S:] == 0.0)
    assert np.all(s_out[:, 3 * S:] == 0.0) and np.all(
        np.asarray(g0["sampler"]["out"]["b"])[3 * S:] == 0.0)
    assert np.abs(r_out[:, : 4 * S]).max() > 0
    assert np.abs(s_out[:, : 3 * S]).max() > 0
    # ...while the shared trunk DOES move (the drift mechanism):
    assert np.abs(np.asarray(g0["refine"]["layers"][0]["w"])).max() > 0

    g1 = jax.grad(loss_fn)(params, 1e-3)
    assert np.abs(np.asarray(g1["refine"]["out"]["w"])[:, 4 * S:]).max() > 0
    assert np.abs(np.asarray(g1["sampler"]["out"]["w"])[:, 3 * S:]).max() > 0

    # Torch oracle: same loss on the actual reference stage-2 render_rays.
    embed_fn, _ = ref.helpers.get_embedder(10, 0)
    embeddirs_fn, _ = ref.helpers.get_embedder(4, 0)

    def network_query_fn(inputs, viewdirs, fn):
        return s2.run_network(
            inputs, viewdirs, fn, embed_fn, embeddirs_fn, netchunk=65536
        )

    ray_batch = torch.cat(
        [
            _t(rays["ndc_o"]), _t(rays["ndc_d"]),
            torch.full((n, 1), 0.0), torch.full((n, 1), 1.0),
            _t(rays["viewdirs"]),
        ],
        -1,
    )
    or_ray_batch = torch.cat(
        [
            _t(rays["or_o"]), _t(rays["or_d"]),
            torch.full((n, 1), 1.0), torch.full((n, 1), 10.0),
            _t(rays["viewdirs"]),
        ],
        -1,
    )
    tgt = _t(np.asarray(target))

    def torch_backward(a_mmrgb):
        for m in (nerf_t, sampler_t, refine_t):
            m.zero_grad()
        out_t = s2.render_rays(
            ray_batch, or_ray_batch,
            network_fn=nerf_t,
            network_query_fn=network_query_fn,
            N_samples=S,
            network_fine=nerf_t,
            raw_noise_std=0.0,
            min_max_ray_net=sampler_t,
            refine_net=refine_t,
            N_point_ray_enc=48,
            embed_fn=embed_fn,
            embeddirs_fn=embeddirs_fn,
            randomize=False,
            train_nerf=True,
            embed_rays=ref.helpers.Pluecker(),
            num_neighbor=V,
            images=_t(sc["images"][:4]),
            poses=_t(sc["poses"][:4]),
            ref_K=_t(K),
            target_pose=_t(sc["poses"][4]),
        )
        loss_t = ((out_t["rgb_map1"] - tgt) ** 2).mean()
        if a_mmrgb > 0:  # the reference's literal gate (:862-865)
            loss_t = loss_t + a_mmrgb * (
                ((out_t["rgb_map0"] - tgt) ** 2).mean()
                + ((out_t["mm_rgb"] - tgt) ** 2).mean()
            )
        loss_t.backward()

    torch_backward(0.0)
    rg_t = refine_t.fc_output.weight.grad.numpy()  # [35, in]
    sg_t = sampler_t.fc_output.weight.grad.numpy()  # [27, in]
    assert np.all(rg_t[4 * S:] == 0.0) and np.abs(rg_t[: 4 * S]).max() > 0
    assert np.all(sg_t[3 * S:] == 0.0) and np.abs(sg_t[: 3 * S]).max() > 0
    assert np.abs(refine_t.fc_backbone[0].weight.grad.numpy()).max() > 0

    def cmp(ours_arr, theirs_param, atol):
        theirs = theirs_param.grad.numpy().T
        scale = max(np.abs(theirs).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(ours_arr) / scale, theirs / scale, atol=atol
        )

    cmp(g0["refine"]["out"]["w"], refine_t.fc_output.weight, 2e-3)
    cmp(g0["sampler"]["out"]["w"], sampler_t.fc_output.weight, 2e-3)
    cmp(g0["nerf"]["rgb"]["w"], nerf_t.rgb_linear.weight, 2e-3)

    torch_backward(1e-3)
    cmp(g1["refine"]["out"]["w"], refine_t.fc_output.weight, 2e-3)
    cmp(g1["sampler"]["out"]["w"], sampler_t.fc_output.weight, 2e-3)
    cmp(g1["refine"]["layers"][0]["w"], refine_t.fc_backbone[0].weight, 2e-3)


def test_sampler_step_gradients_match_reference(ref):
    """Gradient-topology parity for the stage-1 sampler step: identical
    weights/batch, deterministic eval-style forward, loss = mse(rgb1) +
    mse(rgb0) + mse(mm_rgb); per-net gradients must match (validates that
    stop_gradient placement reproduces the reference's no_grad boundaries,
    e.g. the warp detach)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import RenderStatics, init_pronerf_params, render_rays
    from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose
    from pronerf_tpu.utils.synthetic import make_consistent_scene

    base = importlib.import_module("run_S_eS_eN_alter_base")
    sc = make_consistent_scene(n_views=5, H=20, W=26, seed=8)
    H, W, _ = sc["hwf"]
    K = sc["K"]
    V, n = 2, 32

    params = init_pronerf_params(jax.random.PRNGKey(5), num_neighbor=V)
    nerf_t = _load_nerf_into_torch(ref, params["nerf"]).train()
    sampler_t = _load_minmax_into_torch(ref, params["sampler"], 288, 27).train()
    refine_t = _load_minmax_into_torch(
        ref, params["refine"], 6 * 8 + 3 * V * 8, 35
    ).train()

    scene = prepare_scene(
        sc["images"][:4], sc["poses"][:4], K, pack_corners=False
    )
    rays = rays_for_pose(H, W, K, sc["poses"][4])
    rays = {k: v[:n] for k, v in rays.items()}
    target = jnp.asarray(sc["images"][4].reshape(-1, 3)[:n])
    controls = {
        "rng": jax.random.PRNGKey(0),
        "target_t": jnp.asarray(sc["poses"][4][:3, 3]),
    }
    statics = RenderStatics.stage1_sampler(randomize=False, num_neighbor=V)

    def loss_fn(p):
        out = render_rays(p, rays, scene, controls, statics)
        return (
            jnp.mean((out["rgb1"] - target) ** 2)
            + jnp.mean((out["rgb0"] - target) ** 2)
            + jnp.mean((out["mm_rgb"] - target) ** 2)
        )

    g_ours = jax.grad(loss_fn)(params)

    embed_fn, _ = ref.helpers.get_embedder(10, 0)
    embeddirs_fn, _ = ref.helpers.get_embedder(4, 0)

    def network_query_fn(inputs, viewdirs, fn):
        return base.run_network(
            inputs, viewdirs, fn, embed_fn, embeddirs_fn, netchunk=65536
        )

    ray_batch = torch.cat(
        [
            _t(rays["ndc_o"]), _t(rays["ndc_d"]),
            torch.full((n, 1), 1e-6), torch.full((n, 1), 1.0),
            _t(rays["viewdirs"]),
        ],
        -1,
    )
    or_ray_batch = torch.cat(
        [
            _t(rays["or_o"]), _t(rays["or_d"]),
            torch.full((n, 1), 1.0), torch.full((n, 1), 10.0),
            _t(rays["viewdirs"]),
        ],
        -1,
    )
    out_t = base.render_rays(
        ray_batch, or_ray_batch,
        network_fn=nerf_t,
        network_query_fn=network_query_fn,
        N_samples=8,
        raw_noise_std=0.0,
        min_max_ray_net=sampler_t,
        refine_net=refine_t,
        N_point_ray_enc=48,
        embed_fn=embed_fn,
        embeddirs_fn=embeddirs_fn,
        randomize=False,
        train_sampler=True,
        train_nerf=True,
        embed_rays=ref.helpers.Pluecker(),
        num_neighbor=V,
        images=_t(sc["images"][:4]),
        poses=_t(sc["poses"][:4]),
        ref_K=_t(K),
        target_pose=_t(sc["poses"][4]),
        batch_rays_nearest_id=torch.zeros(n, V + 1),
    )
    tgt = _t(np.asarray(target))
    loss_t = (
        ((out_t["rgb_map1"] - tgt) ** 2).mean()
        + ((out_t["rgb_map0"] - tgt) ** 2).mean()
        + ((out_t["mm_rgb"] - tgt) ** 2).mean()
    )
    loss_t.backward()

    def cmp(ours_arr, theirs_param, atol):
        g_t = theirs_param.grad
        assert g_t is not None
        theirs = g_t.numpy().T if g_t.ndim == 2 else g_t.numpy()
        scale = max(np.abs(theirs).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(ours_arr) / scale, theirs / scale, atol=atol
        )

    # sampler net: grads flow through depths, mm terms, mm_rgb
    cmp(g_ours["sampler"]["out"]["w"], sampler_t.fc_output.weight, 2e-3)
    cmp(g_ours["sampler"]["layers"][0]["w"], sampler_t.fc_backbone[0].weight, 2e-3)
    # refine net
    cmp(g_ours["refine"]["out"]["w"], refine_t.fc_output.weight, 2e-3)
    cmp(g_ours["refine"]["layers"][0]["w"], refine_t.fc_backbone[0].weight, 2e-3)
    # nerf
    cmp(g_ours["nerf"]["rgb"]["w"], nerf_t.rgb_linear.weight, 2e-3)
    cmp(g_ours["nerf"]["pts"][0]["w"], nerf_t.pts_linears[0].weight, 2e-3)


def test_sample_pdf_matches_reference_det(ref):
    """Deterministic hierarchical sampling vs the reference's sample_pdf."""
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.ops.sampling import sample_pdf

    rng = np.random.default_rng(9)
    bins = np.sort(rng.uniform(0, 1, size=(12, 9)), -1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(12, 8)).astype(np.float32)
    with torch.no_grad():
        theirs = ref.helpers.sample_pdf(
            _t(bins), _t(weights), 16, det=True
        ).numpy()
    ours = np.asarray(
        sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                   jnp.asarray(weights), 16, det=True)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_img2ssim_matches_reference(ref):
    """Our convolve-based SSIM vs the reference's scipy-based one."""
    scipy = pytest.importorskip("scipy")
    from pronerf_tpu.ops.metrics import img2ssim

    rng = np.random.default_rng(10)
    a = rng.uniform(0, 1, size=(24, 30, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    theirs = ref.helpers.img2ssim(a, b)
    ours = img2ssim(a, b)
    np.testing.assert_allclose(ours, theirs, atol=1e-8)


def _stage1_ref_kwargs(ref, base, nerf_t, sampler_t, refine_t, sc, K, n, V):
    embed_fn, _ = ref.helpers.get_embedder(10, 0)
    embeddirs_fn, _ = ref.helpers.get_embedder(4, 0)

    def network_query_fn(inputs, viewdirs, fn):
        return base.run_network(
            inputs, viewdirs, fn, embed_fn, embeddirs_fn, netchunk=65536
        )

    return dict(
        network_fn=nerf_t,
        network_query_fn=network_query_fn,
        N_samples=8,
        raw_noise_std=0.0,
        min_max_ray_net=sampler_t,
        refine_net=refine_t,
        N_point_ray_enc=48,
        embed_fn=embed_fn,
        embeddirs_fn=embeddirs_fn,
        embed_rays=ref.helpers.Pluecker(),
        num_neighbor=V,
        images=_t(sc["images"][:4]),
        poses=_t(sc["poses"][:4]),
        ref_K=_t(K),
        target_pose=_t(sc["poses"][4]),
    )


def _ray_batches(rays, n, near, far):
    ray_batch = torch.cat(
        [
            _t(rays["ndc_o"]), _t(rays["ndc_d"]),
            torch.full((n, 1), near), torch.full((n, 1), far),
            _t(rays["viewdirs"]),
        ],
        -1,
    )
    or_ray_batch = torch.cat(
        [
            _t(rays["or_o"]), _t(rays["or_d"]),
            torch.full((n, 1), 1.0), torch.full((n, 1), 10.0),
            _t(rays["viewdirs"]),
        ],
        -1,
    )
    return ray_batch, or_ray_batch


@pytest.mark.parametrize(
    "n_mult,dir_expand,dir_jitter",
    [(3, True, False), (3, False, True), (1, False, True), (8, True, True)],
)
def test_stage1_exploration_matches_reference_with_matched_noise(
    ref, monkeypatch, n_mult, dir_expand, dir_jitter
):
    """ORACLE for the stage-1 stochastic NeRF-branch (sample multiplication
    + one-sided gap jitter, ``run_S_eS_eN_alter_base.py:689-729``): inject
    IDENTICAL noise draws into both implementations (the reference's
    ``pytest=True`` seeded-numpy idiom, SURVEY §4.2) and require equal
    outputs. Covers n_mult in {1, 3, max}, both expansion directions, both
    jitter directions."""
    import importlib

    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import RenderStatics, init_pronerf_params, render_rays
    from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose
    from pronerf_tpu.utils.synthetic import make_consistent_scene

    base = importlib.import_module("run_S_eS_eN_alter_base")
    sc = make_consistent_scene(n_views=5, H=20, W=26, seed=6)
    H, W, _ = sc["hwf"]
    K = sc["K"]
    V, n = 2, 48

    params = init_pronerf_params(jax.random.PRNGKey(3), num_neighbor=V)
    nerf_t = _load_nerf_into_torch(ref, params["nerf"])
    sampler_t = _load_minmax_into_torch(ref, params["sampler"], 288, 27)
    refine_t = _load_minmax_into_torch(
        ref, params["refine"], 6 * 8 + 3 * V * 8, 35
    )

    # one shared raw-normal noise panel, sliced by each side as needed
    noise_np = np.random.default_rng(42).normal(size=(n, 64)).astype(np.float32)

    # --- ours: controls carry the coins; only the normal draw is patched
    scene = prepare_scene(
        sc["images"][:4], sc["poses"][:4], K, pack_corners=False
    )
    rays = rays_for_pose(H, W, K, sc["poses"][4])
    rays = {k: v[:n] for k, v in rays.items()}
    rays["pose_id"] = jnp.zeros((n,), jnp.int32)
    controls = {
        "rng": jax.random.PRNGKey(0),
        "n_mult": jnp.int32(n_mult),
        "dir_expand": jnp.asarray(dir_expand),
        "dir_jitter": jnp.asarray(dir_jitter),
        # neighbor positions 0..V-1 of the sorted-by-distance candidates ==
        # the nearest V: lets the reference's random.sample be patched to
        # the same choice below
        "neighbor_subset": jnp.asarray(list(range(V)), jnp.int32),
        "target_t": jnp.asarray(sc["poses"][4][:3, 3]),
    }

    def fake_jax_normal(key, shape, dtype=jnp.float32):
        return jnp.asarray(noise_np[: shape[0], : shape[1]], dtype)

    monkeypatch.setattr(jax.random, "normal", fake_jax_normal)
    statics = RenderStatics.stage1_nerf(
        randomize=True, noise_std=0.0, num_neighbor=V
    )
    # rays originate from the held-out pose 4; randomize=True selects
    # neighbors w.r.t. pose_id 0 -> give the rays that pose's id semantics
    # by aligning target: use pose_id of view 0 and compare against the
    # reference fed batch_rays_nearest_id = zeros (same convention).
    ours = render_rays(params, rays, scene, controls, statics)

    # --- theirs: patch the host RNG + torch.normal to the same draws
    import random as pyrandom

    monkeypatch.setattr(pyrandom, "randint", lambda a, b: n_mult)
    coins = []
    if n_mult > 1:
        coins.append(0.6 if dir_expand else 0.4)   # > 0.5 -> up
    coins.append(0.6 if dir_jitter else 0.4)
    coin_iter = iter(coins)
    monkeypatch.setattr(pyrandom, "random", lambda: next(coin_iter))
    monkeypatch.setattr(
        pyrandom, "sample",
        lambda rng_, k: list(range(k)),
    )

    real_normal = torch.normal

    def fake_torch_normal(*args, size=None, **kw):
        if size is None:
            return real_normal(*args, **kw)
        return torch.from_numpy(noise_np[: size[0], : size[1]].copy())

    monkeypatch.setattr(torch, "normal", fake_torch_normal)

    ray_batch, or_ray_batch = _ray_batches(rays, n, 1e-6, 1.0)
    with torch.no_grad():
        theirs = base.render_rays(
            ray_batch, or_ray_batch,
            randomize=True,
            train_sampler=False,
            train_nerf=True,
            batch_rays_nearest_id=torch.zeros(n, V + 1),
            **_stage1_ref_kwargs(
                ref, base, nerf_t, sampler_t, refine_t, sc, K, n, V
            ),
        )

    np.testing.assert_allclose(
        np.asarray(ours["rgb1"]), theirs["rgb_map1"].numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours["depth"]), theirs["depth_map"].numpy(), atol=2e-3
    )


def test_stage2_jitter_matches_reference_with_matched_noise(ref, monkeypatch):
    """ORACLE for the stage-2 training jitter
    (``run_S_eS_eN_alter_base_refine2.py:646-664``): identical injected
    normal draws and direction coin on both sides."""
    import importlib

    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import RenderStatics, init_pronerf_params, render_rays
    from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose
    from pronerf_tpu.utils.synthetic import make_consistent_scene

    s2 = importlib.import_module("run_S_eS_eN_alter_base_refine2")
    sc = make_consistent_scene(n_views=5, H=20, W=26, seed=6)
    H, W, _ = sc["hwf"]
    K = sc["K"]
    V, n = 2, 48

    params = init_pronerf_params(jax.random.PRNGKey(5), num_neighbor=V)
    nerf_t = _load_nerf_into_torch(ref, params["nerf"])
    sampler_t = _load_minmax_into_torch(ref, params["sampler"], 288, 27)
    refine_t = _load_minmax_into_torch(
        ref, params["refine"], 6 * 8 + 3 * V * 8, 35
    )

    noise_np = np.random.default_rng(7).normal(size=(n, 8)).astype(np.float32)

    scene = prepare_scene(
        sc["images"][:4], sc["poses"][:4], K, pack_corners=False
    )
    rays = rays_for_pose(H, W, K, sc["poses"][4])
    rays = {k: v[:n] for k, v in rays.items()}
    rays["pose_id"] = jnp.zeros((n,), jnp.int32)
    for dir_jitter in (True, False):
        controls = {
            "rng": jax.random.PRNGKey(0),
            "dir_jitter": jnp.asarray(dir_jitter),
            "neighbor_subset": jnp.asarray(list(range(V)), jnp.int32),
            "target_t": jnp.asarray(sc["poses"][4][:3, 3]),
        }

        monkeypatch.setattr(
            jax.random, "normal",
            lambda key, shape, dtype=jnp.float32: jnp.asarray(
                noise_np[: shape[0], : shape[1]], dtype
            ),
        )
        ours = render_rays(
            params, rays, scene, controls,
            RenderStatics.stage2(randomize=True, noise_std=0.0,
                                 num_neighbor=V),
        )

        import random as pyrandom

        monkeypatch.setattr(
            pyrandom, "random", lambda: 0.6 if dir_jitter else 0.4
        )
        monkeypatch.setattr(
            pyrandom, "sample", lambda rng_, k: list(range(k))
        )
        real_normal = torch.normal

        def fake_torch_normal(*args, size=None, **kw):
            if size is None:
                return real_normal(*args, **kw)
            return torch.from_numpy(noise_np[: size[0], : size[1]].copy())

        monkeypatch.setattr(torch, "normal", fake_torch_normal)

        embed_fn, _ = ref.helpers.get_embedder(10, 0)
        embeddirs_fn, _ = ref.helpers.get_embedder(4, 0)

        def network_query_fn(inputs, viewdirs, fn):
            return s2.run_network(
                inputs, viewdirs, fn, embed_fn, embeddirs_fn, netchunk=65536
            )

        ray_batch, or_ray_batch = _ray_batches(rays, n, 0.0, 1.0)
        with torch.no_grad():
            theirs = s2.render_rays(
                ray_batch, or_ray_batch,
                network_fn=nerf_t,
                network_fine=nerf_t,
                network_query_fn=network_query_fn,
                N_samples=8,
                raw_noise_std=0.0,
                min_max_ray_net=sampler_t,
                refine_net=refine_t,
                N_point_ray_enc=48,
                embed_fn=embed_fn,
                embeddirs_fn=embeddirs_fn,
                embed_rays=ref.helpers.Pluecker(),
                num_neighbor=V,
                images=_t(sc["images"][:4]),
                poses=_t(sc["poses"][:4]),
                ref_K=_t(K),
                target_pose=_t(sc["poses"][4]),
                randomize=True,
                train_nerf=True,
                batch_rays_nearest_id=torch.zeros(n, V + 1),
            )

        np.testing.assert_allclose(
            np.asarray(ours["rgb1"]), theirs["rgb_map1"].numpy(), atol=2e-3,
            err_msg=f"dir_jitter={dir_jitter}",
        )
        np.testing.assert_allclose(
            np.asarray(ours["depth"]), theirs["depth_map"].numpy(), atol=2e-3,
            err_msg=f"dir_jitter={dir_jitter}",
        )
