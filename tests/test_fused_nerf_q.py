"""INT8 fused NeRF kernel (kernels/fused_nerf_q.py) vs the f32 forward,
interpreter mode on CPU. The int8 path is a lossy (calibrated post-training
quantization) serving knob, so the contracts here are accuracy BOUNDS plus
exactness of the machinery around the quantized matmuls (padding, block
independence, pipeline wiring)."""

import numpy as np
import jax
import jax.numpy as jnp

from pronerf_tpu.kernels.fused_nerf_q import (
    calibrate_nerf_ranges,
    fused_nerf_raw_tq,
    pack_nerf_params_int8,
)
from pronerf_tpu.models.mlp import init_nerf_mlp
from tests.test_fused_kernel import _inputs, _pts24_t, _reference, _vcon_t


def test_int8_kernel_tracks_f32_reference():
    params = init_nerf_mlp(jax.random.PRNGKey(1))
    pts, dirs = _inputs(n=128)
    packed = pack_nerf_params_int8(params)
    raw = fused_nerf_raw_tq(
        packed, _pts24_t(pts), _vcon_t(params, dirs, jnp.float32),
        rays_per_block=32, interpret=True,
    )
    ref = np.asarray(_reference(params, pts, dirs))
    raw = np.asarray(raw)
    assert np.all(np.isfinite(raw))
    err = np.abs(raw - ref)
    scale = np.std(ref)
    # ~8 chained int8 layers: bound both worst-case and typical error
    assert err.max() < 0.25 * scale + 0.02, (err.max(), scale)
    assert err.mean() < 0.02 * scale + 0.002, (err.mean(), scale)


def test_int8_block_size_and_padding_invariance():
    params = init_nerf_mlp(jax.random.PRNGKey(2))
    pts, dirs = _inputs(n=50, seed=3)
    packed = pack_nerf_params_int8(params)
    vc = _vcon_t(params, dirs, jnp.float32)
    p24 = _pts24_t(pts)
    a = fused_nerf_raw_tq(packed, p24, vc, rays_per_block=32, interpret=True)
    assert a.shape == (50, 8, 4)
    b = fused_nerf_raw_tq(packed, p24, vc, rays_per_block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_int8_explicit_ranges_accepted():
    """Packing with caller-supplied calibration ranges must work (and wider
    ranges must still track the reference, just more coarsely)."""
    params = init_nerf_mlp(jax.random.PRNGKey(4))
    pts, dirs = _inputs(n=64, seed=5)
    ranges = calibrate_nerf_ranges(params)
    wide = {k: (mn * 1.5, mx * 1.5) for k, (mn, mx) in ranges.items()}
    packed = pack_nerf_params_int8(params, ranges=wide)
    raw = np.asarray(fused_nerf_raw_tq(
        packed, _pts24_t(pts), _vcon_t(params, dirs, jnp.float32),
        rays_per_block=32, interpret=True,
    ))
    ref = np.asarray(_reference(params, pts, dirs))
    assert np.all(np.isfinite(raw))
    assert np.abs(raw - ref).max() < 0.4 * np.std(ref) + 0.04


def test_pipeline_int8_close_to_bf16_pallas():
    """render_rays with quant='int8' must track the bf16 Pallas serving
    path; render-level agreement is the real quality contract."""
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
    bf16 = render_rays(
        params, rays, scene, controls,
        RenderStatics.infer(compute_dtype="bfloat16", use_pallas=True,
                            pallas_block_rays=128),
    )
    q = render_rays(
        params, rays, scene, controls,
        RenderStatics.infer(compute_dtype="bfloat16", use_pallas=True,
                            pallas_block_rays=128, quant="int8"),
    )
    rgb_b = np.asarray(bf16["rgb1"], np.float64)
    rgb_q = np.asarray(q["rgb1"], np.float64)
    assert np.all(np.isfinite(rgb_q))
    mse = np.mean((rgb_b - rgb_q) ** 2)
    psnr_vs_bf16 = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr_vs_bf16 > 32.0, psnr_vs_bf16
    np.testing.assert_allclose(
        np.asarray(q["depth"]), np.asarray(bf16["depth"]), atol=0.05
    )
