"""Native C++ runtime vs NumPy reference parity."""

import numpy as np
import pytest

from pronerf_tpu.native import (
    build_ray_pool_native,
    colmap_visibility_native,
    greedy_cover_native,
    is_available,
)
from pronerf_tpu.ops.rays import get_rays_np
from pronerf_tpu.utils.synthetic import make_scene

pytestmark = pytest.mark.skipif(
    not is_available(), reason="native library unavailable (no compiler)"
)


def test_ray_pool_matches_numpy_rays():
    sc = make_scene(n_views=3, H=12, W=16, seed=0)
    H, W, _ = sc["hwf"]
    out = build_ray_pool_native(
        sc["images"], sc["poses"], sc["K"], seed=0, shuffle=False
    )
    assert out is not None
    rays, ids = out
    assert rays.shape == (3 * H * W, 3, 3) and ids.shape == (3 * H * W,)
    for t in range(3):
        ro, rd = get_rays_np(H, W, sc["K"], sc["poses"][t])
        seg = rays[t * H * W : (t + 1) * H * W]
        np.testing.assert_allclose(seg[:, 0], ro.reshape(-1, 3), atol=1e-6)
        np.testing.assert_allclose(seg[:, 1], rd.reshape(-1, 3), atol=1e-5)
        np.testing.assert_allclose(
            seg[:, 2], sc["images"][t].reshape(-1, 3), atol=1e-7
        )
        assert np.all(ids[t * H * W : (t + 1) * H * W] == t)


def test_ray_pool_shuffle_is_permutation():
    sc = make_scene(n_views=2, H=10, W=12, seed=1)
    plain, ids0 = build_ray_pool_native(
        sc["images"], sc["poses"], sc["K"], seed=7, shuffle=False
    )
    shuf, ids1 = build_ray_pool_native(
        sc["images"], sc["poses"], sc["K"], seed=7, shuffle=True
    )
    assert not np.array_equal(plain, shuf)
    # same multiset of rows
    a = np.sort(plain.reshape(len(plain), -1), axis=0)
    b = np.sort(shuf.reshape(len(shuf), -1), axis=0)
    np.testing.assert_allclose(a, b)
    assert np.bincount(ids1).tolist() == np.bincount(ids0).tolist()


def test_colmap_visibility_matches_python(tmp_path):
    from tests.test_data import _write_colmap_model
    from pronerf_tpu.data.colmap import (
        read_images_binary,
        read_points3d_binary,
    )

    _write_colmap_model(tmp_path, n_images=6, n_points=40)
    # python reference
    imdata = read_images_binary(tmp_path / "sparse/0/images.bin")
    ordered = sorted(imdata.values(), key=lambda im: im.name)
    id2idx = {im.id: i for i, im in enumerate(ordered)}
    i_train = [0, 1, 2, 4, 5]
    rank = {idx: r for r, idx in enumerate(i_train)}
    pts = read_points3d_binary(tmp_path / "sparse/0/points3D.bin")
    ref = np.zeros((5, 40), np.float32)
    for col, pt in enumerate(pts.values()):
        for im_id in pt.image_ids:
            ds = id2idx.get(int(im_id))
            if ds in rank:
                ref[rank[ds], col] = 1
    # native
    rank_map = np.full((max(id2idx) + 1,), -1, np.int32)
    for im_id, ds in id2idx.items():
        rank_map[im_id] = rank.get(ds, -1)
    vis = colmap_visibility_native(
        tmp_path / "sparse/0/points3D.bin", rank_map, 5
    )
    assert vis is not None
    np.testing.assert_array_equal(vis, ref)


def test_greedy_cover_native():
    vis = np.zeros((4, 10), np.float32)
    vis[0, :3] = 1
    vis[1, :6] = 1
    vis[2, 6:9] = 1
    vis[3, :2] = 1
    picks = greedy_cover_native(vis, 2)
    assert picks.tolist() == [1, 2]  # 6 points, then 3 uncovered
