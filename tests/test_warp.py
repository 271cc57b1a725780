import numpy as np
import jax.numpy as jnp
import pytest

from pronerf_tpu.ops import (
    bilinear_sample,
    epipolar_colors,
    fuse_projection,
    get_rays_np,
    mean_fill_invalid,
    project_points,
)
from pronerf_tpu.utils.synthetic import make_scene


def test_bilinear_sample_matches_grid_sample():
    """Oracle test against torch grid_sample(align_corners=True, zeros) with
    the reference's push-OOB-to-2.0 trick applied."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    T, H, W, C = 3, 9, 13, 3
    imgs = rng.uniform(0.1, 1.0, size=(T, H, W, C)).astype(np.float32)
    n = 500
    xn = rng.uniform(-1.4, 1.4, size=n).astype(np.float32)
    yn = rng.uniform(-1.4, 1.4, size=n).astype(np.float32)
    vidx = rng.integers(0, T, size=n).astype(np.int32)

    ours = np.asarray(
        bilinear_sample(jnp.asarray(imgs), jnp.asarray(vidx), jnp.asarray(xn), jnp.asarray(yn))
    )

    # torch oracle, per view
    xn_t = xn.copy()
    yn_t = yn.copy()
    oob = (np.abs(xn_t) > 1) | (np.abs(yn_t) > 1)
    xn_t[np.abs(xn_t) > 1] = 2.0
    yn_t[np.abs(yn_t) > 1] = 2.0
    img_t = torch.from_numpy(imgs).permute(0, 3, 1, 2)  # [T, C, H, W]
    grid = torch.zeros(T, n, 1, 2)
    for v in range(T):
        grid[v, :, 0, 0] = torch.from_numpy(xn_t)
        grid[v, :, 0, 1] = torch.from_numpy(yn_t)
    sampled = torch.nn.functional.grid_sample(
        img_t, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )  # [T, C, n, 1]
    expect = sampled[vidx, :, np.arange(n), 0].numpy()
    # the reference forces fully-OOB samples to zero via the 2.0 trick
    expect[oob] = 0.0
    np.testing.assert_allclose(ours, expect, atol=1e-5)


def test_projection_roundtrip_to_source_pixel():
    """A point on the ray through pixel (i, j) of view v must project back
    to exactly (i, j) in view v."""
    scene = make_scene(n_views=4, H=24, W=32, seed=3)
    H, W, _ = scene["hwf"]
    K, poses = scene["K"], scene["poses"]
    M = np.asarray(fuse_projection(jnp.asarray(poses)))
    v = 2
    ro, rd = get_rays_np(H, W, K, poses[v])
    j, i = 7, 21
    for z in (1.0, 2.5, 6.0):
        # camera looks along -z; depth z means camera-space z = -z, and the
        # pipeline lifts points as o + d * z with d_z == -1 in camera frame.
        p = ro[j, i] + rd[j, i] * z
        xn, yn = project_points(
            jnp.asarray(p), jnp.asarray(M[v]), jnp.asarray(K), H, W
        )
        u = (float(xn) + 1) / 2 * (W - 1)
        vv = (float(yn) + 1) / 2 * (H - 1)
        assert abs(u - i) < 1e-3
        assert abs(vv - j) < 1e-3


def test_epipolar_colors_self_view_recovers_image():
    """Warping a view's own rays into itself returns the image colors."""
    scene = make_scene(n_views=3, H=20, W=26, seed=5)
    H, W, _ = scene["hwf"]
    K, poses, images = scene["K"], scene["poses"], scene["images"]
    M = fuse_projection(jnp.asarray(poses))
    v = 1
    ro, rd = get_rays_np(H, W, K, poses[v])
    n = 50
    rng = np.random.default_rng(0)
    # interior pixels: exact-boundary coords are knife-edge in f32 for the
    # OOB test (same as the reference's grid_sample + force-to-2.0 path)
    jj = rng.integers(1, H - 1, n)
    ii = rng.integers(1, W - 1, n)
    rays_o = ro[jj, ii].astype(np.float32)
    rays_d = rd[jj, ii].astype(np.float32)
    z3d = np.tile(np.array([[1.0, 3.0]], np.float32), (n, 1))
    view_idx = np.full((n, 1), v, np.int32)
    cols = np.asarray(
        epipolar_colors(
            jnp.asarray(images), M, jnp.asarray(K), jnp.asarray(view_idx),
            jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(z3d),
        )
    )  # [n, 1, 2, 3]
    expect = images[v, jj, ii]
    for s in range(2):
        np.testing.assert_allclose(cols[:, 0, s], expect, atol=1e-3)


def test_packed_bilinear_matches_unpacked():
    from pronerf_tpu.ops.warp import bilinear_sample_packed, build_corner_stack

    rng = np.random.default_rng(4)
    T, H, W = 3, 11, 14
    imgs = rng.uniform(0.1, 1.0, size=(T, H, W, 3)).astype(np.float32)
    n = 400
    xn = rng.uniform(-1.3, 1.3, size=n).astype(np.float32)
    yn = rng.uniform(-1.3, 1.3, size=n).astype(np.float32)
    vidx = rng.integers(0, T, size=n).astype(np.int32)
    plain = bilinear_sample(
        jnp.asarray(imgs), jnp.asarray(vidx), jnp.asarray(xn), jnp.asarray(yn)
    )
    stack = build_corner_stack(jnp.asarray(imgs))
    packed = bilinear_sample_packed(
        stack, jnp.asarray(vidx), jnp.asarray(xn), jnp.asarray(yn)
    )
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain), atol=1e-6)


def test_mean_fill_invalid():
    c = np.zeros((1, 3, 1, 3), np.float32)
    c[0, 0, 0] = [0.2, 0.4, 0.6]
    c[0, 1, 0] = [0.4, 0.6, 0.8]
    # view 2 invalid (all zeros) -> filled with mean of views 0, 1
    out = np.asarray(mean_fill_invalid(jnp.asarray(c)))
    np.testing.assert_allclose(out[0, 2, 0], [0.3, 0.5, 0.7], atol=1e-4)
    np.testing.assert_allclose(out[0, 0, 0], c[0, 0, 0])


def test_packed_u8_bilinear_matches_unpacked_quantized():
    from pronerf_tpu.ops.warp import (
        bilinear_sample_packed_u8, build_corner_stack_u8,
    )

    rng = np.random.default_rng(6)
    T, H, W = 3, 11, 14
    # 8-bit-exact source colors (the real LLFF case)
    imgs = (rng.integers(0, 256, size=(T, H, W, 3)) / 255.0).astype(np.float32)
    n = 400
    xn = rng.uniform(-1.3, 1.3, size=n).astype(np.float32)
    yn = rng.uniform(-1.3, 1.3, size=n).astype(np.float32)
    vidx = rng.integers(0, T, size=n).astype(np.int32)
    plain = bilinear_sample(
        jnp.asarray(imgs), jnp.asarray(vidx), jnp.asarray(xn), jnp.asarray(yn)
    )
    packed = bilinear_sample_packed_u8(
        build_corner_stack_u8(jnp.asarray(imgs)),
        jnp.asarray(vidx), jnp.asarray(xn), jnp.asarray(yn),
    )
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain), atol=1e-6)


def test_nearest_u8_matches_exact_pixels():
    from pronerf_tpu.ops.warp import build_rgb_word_u8, nearest_sample_packed_u8

    rng = np.random.default_rng(7)
    T, H, W = 2, 9, 12
    imgs = (rng.integers(0, 256, size=(T, H, W, 3)) / 255.0).astype(np.float32)
    packed = build_rgb_word_u8(jnp.asarray(imgs))
    assert packed.shape == (T, H, W)
    # sample exactly at pixel centers -> exact colors
    jj, ii = np.mgrid[0:H, 0:W]
    xn = (2 * ii / (W - 1) - 1).ravel().astype(np.float32)
    yn = (2 * jj / (H - 1) - 1).ravel().astype(np.float32)
    vidx = np.ones_like(xn, np.int32)
    out = np.asarray(
        nearest_sample_packed_u8(
            packed, jnp.asarray(vidx), jnp.asarray(xn), jnp.asarray(yn)
        )
    )
    np.testing.assert_allclose(out, imgs[1].reshape(-1, 3), atol=1e-6)


def test_epipolar_colors_shared_matches_general():
    """The compacted shared-view fast path must equal epipolar_colors with a
    broadcast view_idx, for every table format."""
    import jax.numpy as jnp
    from pronerf_tpu.ops.warp import (
        build_corner_stack,
        build_corner_stack_u8,
        build_rgb_word_u8,
        epipolar_colors,
        epipolar_colors_shared,
        fuse_projection,
    )

    rng = np.random.default_rng(5)
    T, H, W, N, S, V = 6, 12, 16, 40, 8, 4
    images = rng.random((T, H, W, 3), np.float32)
    poses = np.stack([np.eye(3, 4, dtype=np.float32) for _ in range(T)])
    poses[:, :3, 3] = rng.normal(0, 0.3, (T, 3))
    K = np.array([[14.0, 0, W / 2], [0, 14.0, H / 2], [0, 0, 1]], np.float32)
    M = fuse_projection(poses)
    ro = rng.normal(0, 0.2, (N, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (N, 3)).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
    z = np.sort(rng.uniform(1.0, 6.0, (N, S)).astype(np.float32), -1)

    view_ids = jnp.asarray([4, 0, 2, 5], jnp.int32)
    bidx = jnp.broadcast_to(view_ids[None, :], (N, V))
    for table in (
        jnp.asarray(images),
        build_corner_stack(jnp.asarray(images)),
        build_corner_stack_u8(jnp.asarray(images)),
        build_rgb_word_u8(jnp.asarray(images)),
    ):
        a = epipolar_colors(table, M, K, bidx, ro, rd, z)
        b = epipolar_colors_shared(table, M, K, view_ids, ro, rd, z)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epipolar_colors_per_view_matches_general():
    """The training-path per-view sub-cliff gather restructure must equal
    epipolar_colors on the u8 pack for arbitrary per-ray view sets
    (including duplicate slots)."""
    import jax.numpy as jnp

    from pronerf_tpu.ops.warp import (
        build_corner_stack_u8,
        epipolar_colors,
        epipolar_colors_per_view,
        fuse_projection,
    )

    rng = np.random.default_rng(11)
    T, H, W, N, S, V = 7, 12, 16, 50, 8, 4
    images = rng.random((T, H, W, 3)).astype(np.float32)
    poses = np.stack([np.eye(3, 4, dtype=np.float32) for _ in range(T)])
    poses[:, :3, 3] = rng.normal(0, 0.3, (T, 3))
    K = np.array([[14.0, 0, W / 2], [0, 14.0, H / 2], [0, 0, 1]], np.float32)
    M = fuse_projection(poses)
    ro = rng.normal(0, 0.2, (N, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (N, 3)).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
    z = np.sort(rng.uniform(1.0, 6.0, (N, S)).astype(np.float32), -1)
    view_idx = rng.integers(0, T, size=(N, V)).astype(np.int32)
    view_idx[3] = [2, 2, 5, 2]  # duplicate slots must replicate the color

    packed = build_corner_stack_u8(jnp.asarray(images))
    a = epipolar_colors(packed, M, K, jnp.asarray(view_idx), ro, rd, z)
    b = epipolar_colors_per_view(packed, M, K, jnp.asarray(view_idx), ro, rd, z)
    assert a.shape == b.shape == (N, V, S, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_view_gather_auto_never_fires():
    """Auto (`train_gather=-1`) always resolves to the all-views gather: the
    per-view restructure was MEASURED 13x slower at training index volumes
    (scripts/bench_gather_train.py) and survives only as the explicit
    `train_gather=1` opt-in."""
    import jax.numpy as jnp

    from pronerf_tpu.ops.warp import per_view_gather_auto

    small = jnp.zeros((7, 60, 80, 3), jnp.int32)  # 403 KB total
    assert not per_view_gather_auto(small)
    fern = jnp.zeros((17, 378, 504, 3), jnp.int32)  # the falsified case
    assert not per_view_gather_auto(fern)
    fullres = jnp.zeros((17, 756, 1008, 3), jnp.int32)
    assert not per_view_gather_auto(fullres)
    f32 = jnp.zeros((17, 378, 504, 12), jnp.float32)
    assert not per_view_gather_auto(f32)


def test_render_rays_training_per_view_gather_matches():
    """End-to-end training-path equality: train_gather=1 (per-view) vs 0
    (all-views gather) on a randomized stage-1 sampler step with rays from
    different origin poses (distinct per-ray view sets)."""
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import (
        RenderStatics,
        init_pronerf_params,
        render_rays,
    )
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.raygen import rays_for_pose
    from pronerf_tpu.utils.synthetic import make_scene

    sc = make_scene(n_views=6, H=24, W=30, seed=4)
    H, W, _ = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    r0 = rays_for_pose(H, W, sc["K"], sc["poses"][0])
    r3 = rays_for_pose(H, W, sc["K"], sc["poses"][3])
    n = 48
    rays = {k: jnp.concatenate([r0[k][:n], r3[k][:n]]) for k in r0}
    rays["pose_id"] = jnp.concatenate(
        [jnp.zeros((n,), jnp.int32), jnp.full((n,), 3, jnp.int32)]
    )
    controls = {
        "rng": jax.random.PRNGKey(9),
        "n_mult": jnp.int32(2),
        "dir_expand": jnp.asarray(True),
        "dir_jitter": jnp.asarray(True),
        "neighbor_subset": jnp.asarray([0, 2, 3, 4], jnp.int32),
        "target_t": scene["poses_t"][0],
    }
    outs = [
        render_rays(params, rays, scene, controls,
                    RenderStatics.stage1_sampler(train_gather=tg))
        for tg in (0, 1)
    ]
    for k in ("rgb0", "rgb1", "mm_rgb", "depth"):
        np.testing.assert_allclose(
            np.asarray(outs[0][k]), np.asarray(outs[1][k]), atol=1e-6,
            err_msg=k,
        )


def test_windowed_shared_gather_matches_global():
    """The per-tile dynamic source-row window gather (full-res serving
    path) must equal epipolar_colors_shared exactly when windows cover
    the projected rows, and degrade to the OOB-zeros semantics (not wrong
    colors) when they do not."""
    import jax.numpy as jnp

    from pronerf_tpu.ops.warp import (
        build_corner_stack_u8,
        epipolar_colors_shared,
        epipolar_colors_shared_windowed,
        fuse_projection,
    )
    from pronerf_tpu.render.raygen import rays_for_pose
    from pronerf_tpu.utils.synthetic import make_scene

    sc = make_scene(n_views=6, H=40, W=48, seed=0)
    H, W, _ = sc["hwf"]
    packed = build_corner_stack_u8(jnp.asarray(sc["images"]))
    mats = fuse_projection(jnp.asarray(sc["poses"]))
    K = jnp.asarray(sc["K"])
    rays = rays_for_pose(H, W, sc["K"], sc["poses"][0])
    rng = np.random.default_rng(0)
    z3d = jnp.asarray(
        np.sort(rng.uniform(1.0, 6.0, size=(H * W, 8)), axis=-1),
        jnp.float32,
    )
    view_ids = jnp.asarray([1, 2, 3, 4], jnp.int32)

    ref = epipolar_colors_shared(
        packed, mats, K, view_ids, rays["or_o"], rays["or_d"], z3d
    )
    # full-height windows: bitwise identical
    full = epipolar_colors_shared_windowed(
        packed, mats, K, view_ids, rays["or_o"], rays["or_d"], z3d,
        n_tiles=4, window_rows=H,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(ref))

    # small windows: every nonzero output matches ref; misses are zeros
    small = epipolar_colors_shared_windowed(
        packed, mats, K, view_ids, rays["or_o"], rays["or_d"], z3d,
        n_tiles=8, window_rows=12,
    )
    small_np, ref_np = np.asarray(small), np.asarray(ref)
    hit = np.abs(small_np).sum(-1) > 0
    np.testing.assert_allclose(small_np[hit], ref_np[hit], atol=0)
    assert hit.mean() > 0.1  # windows are not degenerate


def test_split_word_gather_bit_identical():
    """gather_split (three rank-1 word takes instead of one [P, 3] row
    take — the full-res relayout experiment) must be BIT-identical to the
    row-gather form on both the shared and the windowed serving paths."""
    import jax.numpy as jnp

    from pronerf_tpu.ops.warp import (
        build_corner_stack_u8,
        epipolar_colors_shared,
        epipolar_colors_shared_windowed,
        fuse_projection,
    )
    from pronerf_tpu.render.raygen import rays_for_pose
    from pronerf_tpu.utils.synthetic import make_scene

    sc = make_scene(n_views=6, H=40, W=48, seed=0)
    H, W, _ = sc["hwf"]
    packed = build_corner_stack_u8(jnp.asarray(sc["images"]))
    mats = fuse_projection(jnp.asarray(sc["poses"]))
    K = jnp.asarray(sc["K"])
    rays = rays_for_pose(H, W, sc["K"], sc["poses"][0])
    rng = np.random.default_rng(1)
    z3d = jnp.asarray(
        np.sort(rng.uniform(1.0, 6.0, size=(H * W, 8)), axis=-1),
        jnp.float32,
    )
    view_ids = jnp.asarray([1, 2, 3, 4], jnp.int32)

    row = epipolar_colors_shared(
        packed, mats, K, view_ids, rays["or_o"], rays["or_d"], z3d
    )
    split = epipolar_colors_shared(
        packed, mats, K, view_ids, rays["or_o"], rays["or_d"], z3d,
        split=True,
    )
    np.testing.assert_array_equal(np.asarray(split), np.asarray(row))
    assert float(np.abs(np.asarray(row)).sum()) > 0

    row_w = epipolar_colors_shared_windowed(
        packed, mats, K, view_ids, rays["or_o"], rays["or_d"], z3d,
        n_tiles=4, window_rows=12,
    )
    split_w = epipolar_colors_shared_windowed(
        packed, mats, K, view_ids, rays["or_o"], rays["or_d"], z3d,
        n_tiles=4, window_rows=12, split=True,
    )
    np.testing.assert_array_equal(np.asarray(split_w), np.asarray(row_w))

    # training per-ray paths, same contract
    from pronerf_tpu.ops.warp import epipolar_colors, epipolar_colors_per_view

    view_idx = jnp.asarray(
        np.random.default_rng(2).integers(0, 6, size=(H * W, 4)), jnp.int32
    )
    row_t = epipolar_colors(
        packed, mats, K, view_idx, rays["or_o"], rays["or_d"], z3d
    )
    split_t = epipolar_colors(
        packed, mats, K, view_idx, rays["or_o"], rays["or_d"], z3d,
        split=True,
    )
    np.testing.assert_array_equal(np.asarray(split_t), np.asarray(row_t))
    row_pv = epipolar_colors_per_view(
        packed, mats, K, view_idx, rays["or_o"], rays["or_d"], z3d
    )
    split_pv = epipolar_colors_per_view(
        packed, mats, K, view_idx, rays["or_o"], rays["or_d"], z3d,
        split=True,
    )
    np.testing.assert_array_equal(np.asarray(split_pv), np.asarray(row_pv))


def test_render_rays_gather_split_statics_match():
    """The gather_split static threads through render_rays unchanged:
    deterministic serving output is identical either way (it is the same
    math, different gather emission)."""
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.models.pronerf import RenderStatics, render_rays
    from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose
    from pronerf_tpu.utils.synthetic import make_scene

    sc = make_scene(n_views=5, H=24, W=32, seed=0)
    H, W, _ = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    rays = rays_for_pose(H, W, sc["K"], sc["poses"][0])
    rays = {k: v[: 64] for k, v in rays.items()}
    controls = {
        "rng": jax.random.PRNGKey(0),
        "target_t": jnp.asarray(sc["poses"][0])[:3, 3],
    }
    import dataclasses

    base = RenderStatics.infer()
    out_row = render_rays(params, rays, scene, controls, base)
    out_split = render_rays(
        params, rays, scene, controls,
        dataclasses.replace(base, gather_split=True),
    )
    np.testing.assert_array_equal(
        np.asarray(out_row["rgb1"]), np.asarray(out_split["rgb1"])
    )


def test_resolve_gather_statics_auto():
    from pronerf_tpu.models import RenderStatics
    from pronerf_tpu.render.renderer import resolve_gather_statics

    s = RenderStatics.infer(gather_tiles=-1)
    # below the cliff: off
    low = resolve_gather_statics(s, 378, 504, 378 * 504)
    assert low.gather_tiles == 0
    # full res: windows under ~2.3MB, ~2 tiles per window height
    hi = resolve_gather_statics(s, 756, 1008, 756 * 1008)
    assert hi.gather_window_rows * 1008 * 12 <= 2.4e6
    assert 6 <= hi.gather_tiles <= 10
    # explicit settings pass through
    ex = resolve_gather_statics(
        RenderStatics.infer(gather_tiles=4, gather_window_rows=64),
        756, 1008, 756 * 1008,
    )
    assert ex.gather_tiles == 4 and ex.gather_window_rows == 64


def test_render_rays_windowed_serving_matches_unwindowed():
    """Full serving pipeline (bf16 + Pallas kernels) with the windowed
    transposed gather must match the unwindowed serving graph when
    windows cover the scene."""
    import jax
    import jax.numpy as jnp

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
    base = render_rays(
        params, rays, scene, controls,
        RenderStatics.infer(compute_dtype="bfloat16", use_pallas=True,
                            pallas_block_rays=128),
    )
    win = render_rays(
        params, rays, scene, controls,
        RenderStatics.infer(compute_dtype="bfloat16", use_pallas=True,
                            pallas_block_rays=128, gather_tiles=4,
                            gather_window_rows=H),
    )
    # tolerances: the transposed path projects as (M o + t) + z (M d) vs
    # M (o + d z) + t — identical math, different fp association; a few
    # points shift sub-pixel, nudging gathered colors by ~1/255 through
    # the bf16 refine net (rgb0 feels it most; all within bf16 eps)
    for k, atol in (("rgb1", 1e-3), ("rgb0", 5e-3), ("depth", 1e-3)):
        np.testing.assert_allclose(
            np.asarray(win[k]), np.asarray(base[k]), atol=atol, err_msg=k
        )


def test_render_rays_gather_bf16_statics_match():
    """gather_bf16 moves the serving layout boundary to bf16 colors; the
    fused kernels cast their input to bf16 regardless, so valid colors are
    bit-identical and only the invalid-fill means shift by ~1 ulp of bf16.
    Render outputs must agree tightly between the forced and disabled
    settings of the serving graph."""
    import dataclasses

    import jax
    import jax.numpy as jnp

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
    serve = RenderStatics.infer(
        compute_dtype="bfloat16", use_pallas=True, pallas_block_rays=128
    )
    off = render_rays(
        params, rays, scene, controls,
        dataclasses.replace(serve, gather_bf16=0),
    )
    on = render_rays(
        params, rays, scene, controls,
        dataclasses.replace(serve, gather_bf16=1),
    )
    # auto (-1) == forced on under the fused serving kernels
    auto = render_rays(params, rays, scene, controls, serve)
    for k in ("rgb1", "rgb0", "depth"):
        np.testing.assert_array_equal(
            np.asarray(auto[k]), np.asarray(on[k]), err_msg=k
        )
        np.testing.assert_allclose(
            np.asarray(on[k]), np.asarray(off[k]), atol=1e-2, err_msg=k
        )
    # windowed serving graph honors the knob the same way
    win_on = render_rays(
        params, rays, scene, controls,
        dataclasses.replace(serve, gather_tiles=4, gather_window_rows=H),
    )
    win_off = render_rays(
        params, rays, scene, controls,
        dataclasses.replace(serve, gather_tiles=4, gather_window_rows=H,
                            gather_bf16=0),
    )
    np.testing.assert_allclose(
        np.asarray(win_on["rgb1"]), np.asarray(win_off["rgb1"]), atol=1e-2
    )


def test_warp_transposed_out_matches_row_major():
    """transposed_out emits the same values as the row-major form for both
    shared gathers: [V, S*3, N] is a pure re-layout of [N, V, S, 3]."""
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.ops.warp import (
        build_corner_stack_u8,
        epipolar_colors_shared,
        epipolar_colors_shared_windowed,
        fuse_projection,
    )
    from pronerf_tpu.utils.synthetic import make_scene

    sc = make_scene(n_views=4, H=20, W=24, seed=3)
    packed = build_corner_stack_u8(jnp.asarray(sc["images"]))
    fused = jax.vmap(fuse_projection)(jnp.asarray(sc["poses"]))
    K = jnp.asarray(sc["K"], jnp.float32)
    key = jax.random.PRNGKey(0)
    N, S = 96, 8
    rays_o = jnp.zeros((N, 3))
    rays_d = jax.random.normal(key, (N, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z3d = jnp.sort(jax.random.uniform(key, (N, S), minval=0.5, maxval=4.0))
    view_ids = jnp.asarray([0, 1, 2], jnp.int32)

    row = epipolar_colors_shared(
        packed, fused, K, view_ids, rays_o, rays_d, z3d
    )  # [N, V, S, 3]
    t = epipolar_colors_shared(
        packed, fused, K, view_ids, rays_o, rays_d, z3d,
        transposed_out=True,
    )  # [V, S*3, N]
    want = np.transpose(np.asarray(row), (1, 2, 3, 0)).reshape(3, S * 3, N)
    np.testing.assert_array_equal(np.asarray(t, np.float32), want)

    row_w = epipolar_colors_shared_windowed(
        packed, fused, K, view_ids, rays_o, rays_d, z3d,
        n_tiles=4, window_rows=20,
    )
    t_w = epipolar_colors_shared_windowed(
        packed, fused, K, view_ids, rays_o, rays_d, z3d,
        n_tiles=4, window_rows=20, transposed_out=True,
    )
    want_w = np.transpose(np.asarray(row_w), (1, 2, 3, 0)).reshape(
        3, S * 3, N
    )
    np.testing.assert_array_equal(np.asarray(t_w, np.float32), want_w)


def test_render_rays_gather_transposed_statics_match():
    """The transposed gather emit (gather_transposed) changes only the
    layout in which the epipolar colors reach the fused refine kernel:
    serving outputs must match the row-major graph tightly, windowed and
    unwindowed, at both epi_layouts."""
    import dataclasses

    import jax
    import jax.numpy as jnp

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
    for extra in ({}, {"gather_tiles": 4, "gather_window_rows": H},
                  {"epi_layout": "svc"}):
        serve = dataclasses.replace(
            RenderStatics.infer(compute_dtype="bfloat16", use_pallas=True,
                                pallas_block_rays=128),
            **extra,
        )
        on = render_rays(params, rays, scene, controls,
                         dataclasses.replace(serve, gather_transposed=1))
        off = render_rays(params, rays, scene, controls,
                          dataclasses.replace(serve, gather_transposed=0))
        # auto (-1) resolves to the row-major graph: the transposed emit
        # measured slower on v5e (see RenderStatics.gather_transposed)
        auto = render_rays(params, rays, scene, controls, serve)
        for k in ("rgb1", "rgb0", "depth"):
            np.testing.assert_array_equal(
                np.asarray(auto[k]), np.asarray(off[k]),
                err_msg=f"auto!=off {k} {extra}",
            )
            np.testing.assert_allclose(
                np.asarray(on[k]), np.asarray(off[k]), atol=2e-6,
                err_msg=f"on!=off {k} {extra}",
            )
