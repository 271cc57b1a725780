"""Pallas fused (PE -> NeRF MLP) kernel vs the XLA forward, in interpreter
mode on CPU. The kernel runs transposed (rays on lanes, one sample per grid
step) and returns raw [N, S, 4] with the nerf_mlp_apply contract;
compositing happens in the shared ``ops.composite``."""

import numpy as np
import jax
import jax.numpy as jnp

from pronerf_tpu.kernels import fused_nerf_raw_t, pack_nerf_params
from pronerf_tpu.models.mlp import init_nerf_mlp, nerf_mlp_apply
from pronerf_tpu.ops.encoding import positional_encoding


def _vcon_t(params, dirs, dtype):
    d_pe = positional_encoding(dirs, 4)
    wv = jnp.asarray(params["views"]["w"])[256:]
    return jax.lax.dot_general(
        wv.astype(dtype), d_pe.astype(dtype),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [128, N]


def _pts24_t(pts):
    """[N, S, 3] -> [S*3, N] with row 3*s + c = coord c of sample s."""
    N, S, _ = pts.shape
    return jnp.transpose(pts.reshape(N, S * 3))


def _reference(params, pts, dirs):
    x_pe = positional_encoding(pts, 10)
    d_pe = positional_encoding(dirs, 4)
    d_pe = jnp.broadcast_to(d_pe[:, None, :], (*pts.shape[:2], 27))
    return nerf_mlp_apply(params, x_pe, d_pe, (4,))


def _inputs(n=96, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 2)
    pts = jax.random.uniform(ks[0], (n, 8, 3), minval=-1.0, maxval=1.0)
    dirs = jax.random.normal(ks[1], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return pts, dirs


def test_fused_raw_matches_reference_f32():
    params = init_nerf_mlp(jax.random.PRNGKey(1))
    pts, dirs = _inputs()
    packed = pack_nerf_params(params, dtype=jnp.float32)
    raw = fused_nerf_raw_t(
        packed, _pts24_t(pts), _vcon_t(params, dirs, jnp.float32),
        rays_per_block=32, interpret=True,
    )
    ref = _reference(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(ref), atol=3e-5)


def test_fused_raw_bf16_close():
    params = init_nerf_mlp(jax.random.PRNGKey(2))
    pts, dirs = _inputs(seed=3)
    packed = pack_nerf_params(params)  # bf16
    raw = fused_nerf_raw_t(
        packed, _pts24_t(pts), _vcon_t(params, dirs, jnp.bfloat16),
        rays_per_block=32, interpret=True,
    )
    ref = _reference(params, pts, dirs)
    assert np.all(np.isfinite(np.asarray(raw)))
    np.testing.assert_allclose(np.asarray(raw), np.asarray(ref), atol=0.15)


def test_fused_raw_padding():
    """Non-multiple-of-block ray counts are padded and trimmed."""
    params = init_nerf_mlp(jax.random.PRNGKey(1))
    pts, dirs = _inputs(n=50)
    packed = pack_nerf_params(params, dtype=jnp.float32)
    vc = _vcon_t(params, dirs, jnp.float32)
    p24 = _pts24_t(pts)
    raw = fused_nerf_raw_t(packed, p24, vc, rays_per_block=32, interpret=True)
    assert raw.shape == (50, 8, 4)
    big = fused_nerf_raw_t(packed, p24, vc, rays_per_block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(big), atol=1e-5)


def test_pipeline_pallas_path_matches_xla():
    """render_rays with use_pallas must match the plain infer path (f32)."""
    from pronerf_tpu.models import init_pronerf_params, render_rays, RenderStatics
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.raygen import rays_for_pose
    from pronerf_tpu.utils.synthetic import make_scene

    sc = make_scene(n_views=5, H=16, W=20, seed=0)
    H, W, _ = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    rays = rays_for_pose(H, W, sc["K"], sc["poses"][1])
    controls = {
        "rng": jax.random.PRNGKey(0),
        "target_t": jnp.asarray(sc["poses"][1][:3, 3]),
    }
    plain = render_rays(params, rays, scene, controls, RenderStatics.infer())
    fused = render_rays(
        params, rays, scene, controls,
        RenderStatics.infer(use_pallas=True, pallas_block_rays=128),
    )
    np.testing.assert_allclose(
        np.asarray(fused["rgb1"]), np.asarray(plain["rgb1"]), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused["depth"]), np.asarray(plain["depth"]), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(fused["weights"]), np.asarray(plain["weights"]), atol=5e-5
    )


def test_fused_minmax_matches_folded():
    """Transposed MinMax kernel == the folded XLA forward (interpret)."""
    from pronerf_tpu.kernels.fused_minmax import (
        fused_minmax_t,
        pack_minmax_params,
    )
    from pronerf_tpu.models.mlp import (
        init_minmax_mlp,
        minmax_mlp_apply_folded,
    )

    key = jax.random.PRNGKey(0)
    # sampler shape: in 6*48, out 27; refine shape: in 48+96, out 35
    for reps, rest, out_w in ((48, 0, 27), (8, 96, 35)):
        p = init_minmax_mlp(key, 6, 256, 6 * reps + rest, out_w)
        n = 70
        x_rep = jax.random.normal(jax.random.PRNGKey(1), (n, 6))
        x_rest = (
            jax.random.normal(jax.random.PRNGKey(2), (n, rest))
            if rest else None
        )
        ref = minmax_mlp_apply_folded(p, x_rep, reps, x_rest, jnp.float32)
        packed = pack_minmax_params(p, reps, jnp.float32)
        x_t = x_rep.T if x_rest is None else jnp.concatenate(
            [x_rep.T, x_rest.T], axis=0
        )
        got = fused_minmax_t(packed, x_t, rays_per_block=32,
                             interpret=True)[:, :out_w]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5
        )


def test_pipeline_pallas_bf16_close_to_xla_bf16():
    """The full serving config (bf16 + all three fused kernels) must track
    the bf16 XLA path."""
    from pronerf_tpu.models import init_pronerf_params, render_rays, RenderStatics
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.raygen import rays_for_pose
    from pronerf_tpu.utils.synthetic import make_scene

    sc = make_scene(n_views=5, H=16, W=20, seed=0)
    H, W, _ = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    rays = rays_for_pose(H, W, sc["K"], sc["poses"][1])
    controls = {
        "rng": jax.random.PRNGKey(0),
        "target_t": jnp.asarray(sc["poses"][1][:3, 3]),
    }
    xla = render_rays(
        params, rays, scene, controls,
        RenderStatics.infer(compute_dtype="bfloat16"),
    )
    fused = render_rays(
        params, rays, scene, controls,
        RenderStatics.infer(compute_dtype="bfloat16", use_pallas=True,
                            pallas_block_rays=128),
    )
    np.testing.assert_allclose(
        np.asarray(fused["rgb1"]), np.asarray(xla["rgb1"]), atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(fused["depth"]), np.asarray(xla["depth"]), atol=0.02
    )


def test_fused_composite_kernel_matches_ops_composite():
    """The in-kernel streaming composite (grid-axis accumulation) must
    equal fused_raw + ops.composite with mm terms (inference semantics),
    including the weights/sigma secondary outputs."""
    from pronerf_tpu.kernels.fused_nerf import fused_nerf_composite_t
    from pronerf_tpu.ops.composite import composite

    params = init_nerf_mlp(jax.random.PRNGKey(4))
    pts, dirs = _inputs(n=96, seed=5)
    key = jax.random.PRNGKey(6)
    ks = jax.random.split(key, 3)
    z = jnp.sort(jax.random.uniform(ks[0], (96, 8)), axis=-1)
    mm_add = jax.random.normal(ks[1], (96, 8))
    mm_mul = jax.random.normal(ks[2], (96, 8)) + 0.5
    rays_d = dirs * 1.3

    packed = pack_nerf_params(params, dtype=jnp.float32)
    vc = _vcon_t(params, dirs, jnp.float32)
    raw = fused_nerf_raw_t(
        packed, _pts24_t(pts), vc, rays_per_block=32, interpret=True
    )
    ref = composite(raw, z, rays_d, mm_add=mm_add, mm_mul=mm_mul)

    got = fused_nerf_composite_t(
        packed, _pts24_t(pts), vc, z.T, mm_add.T, mm_mul.T,
        jnp.linalg.norm(rays_d, axis=-1)[None, :],
        rays_per_block=32, interpret=True,
    )
    for k, atol in (("rgb", 2e-5), ("depth", 2e-5), ("acc", 2e-5),
                    ("weights", 2e-5), ("disp", 1e-3)):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=atol, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(got["sigma"]), np.asarray(raw[..., 3]), atol=2e-5
    )


def test_render_rays_fuse_composite_off_matches_on():
    """fuse_composite=False (raw kernel + XLA composite) and the default
    fused path must agree — the A/B knob is semantics-neutral."""
    from pronerf_tpu.models import (
        RenderStatics,
        init_pronerf_params,
        render_rays,
    )
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.raygen import rays_for_pose
    from pronerf_tpu.utils.synthetic import make_scene

    sc = make_scene(n_views=5, H=16, W=20, seed=0)
    H, W, _ = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    rays = rays_for_pose(H, W, sc["K"], sc["poses"][1])
    controls = {
        "rng": jax.random.PRNGKey(0),
        "target_t": jnp.asarray(sc["poses"][1][:3, 3]),
    }
    on = render_rays(
        params, rays, scene, controls,
        RenderStatics.infer(use_pallas=True, pallas_block_rays=128),
    )
    off = render_rays(
        params, rays, scene, controls,
        RenderStatics.infer(use_pallas=True, pallas_block_rays=128,
                            fuse_composite=False),
    )
    for k in ("rgb1", "depth", "acc", "weights", "sigma"):
        np.testing.assert_allclose(
            np.asarray(on[k]), np.asarray(off[k]), atol=3e-5, err_msg=k
        )
