"""The transposed serving pipeline (models/pronerf_t.py) matches the
row-major serving graph: same math, rays-on-lanes layout.

All comparisons run on CPU with the Pallas kernels in interpret mode
(automatic off-TPU); the pipelines differ only by documented float
reassociations (the refine first-layer row permutation and the sampler
collinearity fold), so tolerances are tight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pronerf_tpu.models import init_pronerf_params
from pronerf_tpu.models.pronerf import RenderStatics, render_rays
from pronerf_tpu.models.pronerf_t import render_rays_t, transposed_eligible
from pronerf_tpu.ops.warp import (
    build_corner_stack_u8,
    epipolar_colors_shared,
    epipolar_colors_shared_t,
    fuse_projection,
    mean_fill_invalid,
    mean_fill_invalid_t,
)
from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose
from pronerf_tpu.utils.synthetic import make_scene


@pytest.fixture(scope="module")
def tiny():
    H, W = 24, 32
    sc = make_scene(n_views=6, H=H, W=W, focal=0.9 * W, seed=3)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    rays = rays_for_pose(H, W, np.asarray(sc["K"]), jnp.asarray(sc["poses"][0]))
    return dict(sc=sc, scene=scene, rays=rays, H=H, W=W)


def _gather_inputs(tiny, n=64, s=8):
    rng = np.random.default_rng(0)
    rays = tiny["rays"]
    or_o = np.asarray(rays["or_o"][:n])
    or_d = np.asarray(rays["or_d"][:n])
    z3d = np.sort(rng.uniform(1.0, 8.0, (n, s)).astype(np.float32), axis=1)
    view_ids = jnp.asarray([0, 2, 3, 5], jnp.int32)
    return or_o, or_d, z3d, view_ids


def _project_unrolled(M, K, H, W, or_o, or_d, z3d):
    """The transposed pipeline's scalar-broadcast projection (the einsum
    form lowers to serial while loops on TPU — ops/warp.py), replicated
    row-major so gather/lerp parity can be asserted EXACTLY, independent
    of the (sub-0.01-pixel) projection reassociation differences."""
    pts = or_o[:, None, :] + or_d[:, None, :] * z3d[..., None]  # [N, S, 3]
    p = [
        M[i, 0] * pts[..., 0] + M[i, 1] * pts[..., 1]
        + M[i, 2] * pts[..., 2] + M[i, 3]
        for i in range(3)
    ]
    z = jnp.abs(p[2]) + 1e-8
    u = K[0, 0] * p[0] / z + K[0, 2]
    v = K[1, 1] * p[1] / z + K[1, 2]
    return 2.0 * u / (W - 1) - 1.0, 2.0 * v / (H - 1) - 1.0


def test_epipolar_colors_shared_t_matches(tiny):
    """The transposed gather/unpack/lerp equals the row-major u8 bilinear
    sampler given IDENTICAL projections (computed by the same unrolled
    formula); the projections themselves match the einsum form to
    sub-0.01 pixel (asserted separately)."""
    from pronerf_tpu.ops.warp import (
        bilinear_sample_packed_u8,
        project_points,
    )

    scene = tiny["scene"]
    H, W = tiny["H"], tiny["W"]
    or_o, or_d, z3d, view_ids = _gather_inputs(tiny)
    refs = []
    for v in range(4):
        M = scene["fused_mats"][view_ids[v]]
        xn, yn = _project_unrolled(
            M, scene["K"], H, W, jnp.asarray(or_o), jnp.asarray(or_d),
            jnp.asarray(z3d),
        )
        # projection parity vs the einsum form (row-major path)
        xn_e, yn_e = project_points(
            jnp.asarray(or_o[:, None, :] + or_d[:, None, :]
                        * z3d[..., None]), M, scene["K"], H, W,
        )
        assert np.abs(np.asarray(xn - xn_e)).max() < 2e-3
        assert np.abs(np.asarray(yn - yn_e)).max() < 2e-3
        img_v = scene["images"][view_ids[v]][None]
        refs.append(bilinear_sample_packed_u8(
            img_v, jnp.zeros(xn.shape, jnp.int32), xn, yn
        ))  # [N, S, 3]
    ref = jnp.stack(refs, axis=1)  # [N, V, S, 3]
    got_t = epipolar_colors_shared_t(
        scene["images"], scene["fused_mats"], scene["K"], view_ids,
        jnp.asarray(or_o.T), jnp.asarray(or_d.T), jnp.asarray(z3d.T),
    )  # [V, 3, S, N]
    got = jnp.transpose(got_t, (3, 0, 2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_epipolar_colors_shared_t_windowed_covering_is_exact(tiny):
    scene = tiny["scene"]
    H = tiny["H"]
    or_o, or_d, z3d, view_ids = _gather_inputs(tiny, n=60)
    base = epipolar_colors_shared_t(
        scene["images"], scene["fused_mats"], scene["K"], view_ids,
        jnp.asarray(or_o.T), jnp.asarray(or_d.T), jnp.asarray(z3d.T),
    )
    # full-height windows cover every projection -> bit-exact, and n=60
    # exercises the lane padding (4 tiles x 15 -> pads to 60... use 7 tiles
    # to force a remainder)
    win = epipolar_colors_shared_t(
        scene["images"], scene["fused_mats"], scene["K"], view_ids,
        jnp.asarray(or_o.T), jnp.asarray(or_d.T), jnp.asarray(z3d.T),
        n_tiles=7, window_rows=H,
    )
    np.testing.assert_array_equal(np.asarray(win), np.asarray(base))


def test_mean_fill_invalid_t_matches():
    rng = np.random.default_rng(1)
    colors = rng.uniform(0.0, 1.0, (37, 4, 8, 3)).astype(np.float32)
    colors[rng.uniform(size=colors.shape[:3]) < 0.3] = 0.0  # invalid warps
    ref = mean_fill_invalid(jnp.asarray(colors))
    got_t = mean_fill_invalid_t(
        jnp.asarray(colors.transpose(1, 3, 2, 0))
    )  # [V, 3, S, N]
    got = jnp.transpose(got_t, (3, 0, 2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("dtype", [None, "bfloat16"])
def test_render_rays_t_matches_row_major(tiny, dtype):
    scene, rays = tiny["scene"], tiny["rays"]
    params = init_pronerf_params(jax.random.PRNGKey(0))
    statics = RenderStatics.infer(
        compute_dtype=dtype, use_pallas=True, transposed=True,
        pallas_block_rays=256,
    )
    assert transposed_eligible(statics, scene["images"])
    sub = {k: v[:192] for k, v in rays.items()}
    controls = {
        "rng": jax.random.PRNGKey(0),
        "target_t": jnp.asarray(tiny["sc"]["poses"][0])[:3, 3],
    }
    ref = render_rays(params, sub, scene, controls, statics)
    got = render_rays_t(params, sub, scene, controls, statics)
    assert set(got) == set(ref)
    # f32: differences are the documented reassociations (refine row
    # permutation; fused-vs-unfolded sampler; unrolled vs einsum
    # projection) — tiny almost everywhere, but a reassociated
    # depth/projection can flip a DISCRETE branch (out-of-bounds /
    # warp-validity / bilinear-corner thresholds) for isolated rays, so
    # the bulk and the outlier FRACTION are bounded instead of the max.
    # bf16: operand rounding dominates.
    bulk, tail = (2e-2, 5e-2) if dtype == "bfloat16" else (2e-3, 5e-3)
    for k in ("rgb1", "rgb0", "mm_rgb", "depth", "acc", "depth0"):
        diff = np.abs(
            np.asarray(got[k], np.float32) - np.asarray(ref[k], np.float32)
        )
        assert np.percentile(diff, 99) < bulk, (k, np.percentile(diff, 99))
        assert (diff > tail).mean() < 0.01, (k, diff.max(),
                                             (diff > tail).mean())


def test_frame_renderer_transposed_equals_row_major(tiny):
    from pronerf_tpu.render.renderer import make_frame_renderer

    params = init_pronerf_params(jax.random.PRNGKey(1))
    H, W = tiny["H"], tiny["W"]
    kw = dict(
        compute_dtype="bfloat16", use_pallas=True, pallas_block_rays=256
    )
    c2w = jnp.asarray(tiny["sc"]["poses"][1])
    out_r = make_frame_renderer(
        RenderStatics.infer(transposed=False, **kw), H, W, tiny["sc"]["K"],
        tile_rays=0,
    )(params, tiny["scene"], c2w)
    out_t = make_frame_renderer(
        RenderStatics.infer(transposed=True, **kw), H, W, tiny["sc"]["K"],
        tile_rays=0,
    )(params, tiny["scene"], c2w)
    for k in out_r:
        np.testing.assert_allclose(
            np.asarray(out_t[k], np.float32),
            np.asarray(out_r[k], np.float32),
            atol=2e-2, err_msg=k,
        )
