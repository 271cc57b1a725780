"""Pallas fused (PE -> NeRF -> composite) kernel vs the reference XLA path,
in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from pronerf_tpu.kernels import fused_nerf_composite, pack_nerf_params
from pronerf_tpu.models.mlp import init_nerf_mlp, nerf_mlp_apply
from pronerf_tpu.ops.composite import composite
from pronerf_tpu.ops.encoding import positional_encoding


def _reference(params, pts, dirs, z, dnorm, add, mul):
    x_pe = positional_encoding(pts, 10)
    d_pe = positional_encoding(dirs, 4)
    d_pe = jnp.broadcast_to(d_pe[:, None, :], (*pts.shape[:2], 27))
    raw = nerf_mlp_apply(params, x_pe, d_pe, (4,))
    rays_d = jnp.concatenate(
        [dnorm[:, None], jnp.zeros((len(dnorm), 2))], axis=-1
    )  # norm == dnorm
    return composite(raw, z, rays_d, mm_add=add, mm_mul=mul)


def _inputs(n=96, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    pts = jax.random.uniform(ks[0], (n, 8, 3), minval=-1.0, maxval=1.0)
    dirs = jax.random.normal(ks[1], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(ks[2], (n, 8)), axis=-1)
    dnorm = jax.random.uniform(ks[3], (n,), minval=0.5, maxval=2.0)
    add = 0.3 * jax.random.normal(ks[4], (n, 8))
    mul = 1.0 + 0.3 * jax.random.normal(ks[5], (n, 8))
    return pts, dirs, z, dnorm, add, mul


def test_fused_kernel_matches_reference_f32():
    params = init_nerf_mlp(jax.random.PRNGKey(1))
    pts, dirs, z, dnorm, add, mul = _inputs()
    packed = pack_nerf_params(params, dtype=jnp.float32)
    out = fused_nerf_composite(
        packed, pts, dirs, z, dnorm, add, mul, block_rays=32, interpret=True
    )
    ref = _reference(params, pts, dirs, z, dnorm, add, mul)
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["acc"]), np.asarray(ref["acc"]), atol=2e-5
    )


def test_fused_kernel_bf16_close():
    params = init_nerf_mlp(jax.random.PRNGKey(2))
    pts, dirs, z, dnorm, add, mul = _inputs(seed=3)
    packed = pack_nerf_params(params)  # bf16
    out = fused_nerf_composite(
        packed, pts, dirs, z, dnorm, add, mul, block_rays=32, interpret=True
    )
    ref = _reference(params, pts, dirs, z, dnorm, add, mul)
    assert np.all(np.isfinite(np.asarray(out["rgb"])))
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=0.05
    )


def test_fused_kernel_padding():
    """Non-multiple-of-block ray counts are padded and trimmed."""
    params = init_nerf_mlp(jax.random.PRNGKey(1))
    pts, dirs, z, dnorm, add, mul = _inputs(n=50)
    packed = pack_nerf_params(params, dtype=jnp.float32)
    out = fused_nerf_composite(
        packed, pts, dirs, z, dnorm, add, mul, block_rays=32, interpret=True
    )
    assert out["rgb"].shape == (50, 3)
    big = fused_nerf_composite(
        packed, pts, dirs, z, dnorm, add, mul, block_rays=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(big["rgb"]), atol=1e-5
    )


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
        params, rays, scene, controls, RenderStatics.infer(use_pallas=True)
    )
    np.testing.assert_allclose(
        np.asarray(fused["rgb1"]), np.asarray(plain["rgb1"]), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused["depth"]), np.asarray(plain["depth"]), atol=5e-4
    )
