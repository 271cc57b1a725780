import numpy as np
import pytest

from pronerf_tpu.data import (
    greedy_reference_views,
    load_llff_data,
    load_llff_data_infer,
    poses_avg,
    read_images_binary,
    read_points3d_binary,
    recenter_poses,
)


# Fixture builders live in the package so scripts/verify_fern.py can run
# the same CI-style protocol; keep the old names for test imports.
from pronerf_tpu.utils.fixtures import (  # noqa: E402
    write_colmap_model as _write_colmap_model,
    write_llff_dataset as _write_llff_dataset,
)


def test_load_llff_data(tmp_path):
    _write_llff_dataset(tmp_path)
    images, poses, bds, render_poses, i_test = load_llff_data(
        tmp_path, factor=1
    )
    assert images.shape == (6, 24, 32, 3)
    assert images.dtype == np.float32 and images.max() <= 1.0
    assert poses.shape == (6, 3, 5)
    assert render_poses.shape == (120, 3, 5)
    assert 0 <= i_test < 6
    # bounds rescaled so bds.min() * 0.75 == 1
    np.testing.assert_allclose(bds.min() * 0.75, 1.0, rtol=1e-5)
    # recentred: average pose ~ identity
    avg = poses_avg(poses)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)


def test_load_llff_data_minify(tmp_path):
    _write_llff_dataset(tmp_path, H=24, W=32)
    images, poses, _, _, _ = load_llff_data(tmp_path, factor=2)
    assert images.shape == (6, 12, 16, 3)
    # hwf updated: focal halved
    np.testing.assert_allclose(poses[0, 2, 4], 15.0, rtol=1e-5)
    assert (tmp_path / "images_2").exists()


def test_recenter_poses_identity_fixture():
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(3, 4, dtype=np.float32)[None], (5, 1, 1))
    poses = np.concatenate(
        [poses, np.tile(np.array([[24.0], [32.0], [30.0]], np.float32)[None], (5, 1, 1))], -1
    )
    poses[:, :3, 3] = rng.normal(0, 0.1, size=(5, 3))
    rec = recenter_poses(poses)
    np.testing.assert_allclose(rec[:, :3, 3].mean(0), 0.0, atol=1e-6)


def test_colmap_readers_roundtrip(tmp_path):
    _write_colmap_model(tmp_path)
    ims = read_images_binary(tmp_path / "sparse/0/images.bin")
    assert len(ims) == 6
    assert ims[1].name == "img_000.png"
    pts = read_points3d_binary(tmp_path / "sparse/0/points3D.bin")
    assert len(pts) == 40
    assert len(pts[1].image_ids) == 6  # point 0 seen by every view


def test_greedy_reference_views(tmp_path):
    _write_colmap_model(tmp_path)
    i_train = [0, 1, 2, 3, 4]  # view 5 held out
    refs = greedy_reference_views(tmp_path / "sparse/0", i_train, 2)
    # view 4 sees the most points (25), then the greedy update leaves view
    # count ordering intact for remaining coverage
    assert refs[0] == 4
    assert len(refs) == 2 and refs[1] != refs[0]
    with pytest.raises(ValueError):
        greedy_reference_views(tmp_path / "sparse/0", i_train, None)


def test_load_llff_data_infer(tmp_path):
    _write_llff_dataset(tmp_path)
    _write_colmap_model(tmp_path)
    images, poses, bds, rp, i_test, i_ref = load_llff_data_infer(
        tmp_path, factor=1, num_neighbor=2, llffhold=3
    )
    np.testing.assert_array_equal(i_test, [0, 3])
    assert len(i_ref) == 2
    assert all(r not in i_test for r in i_ref)


def test_spherify_poses():
    from pronerf_tpu.data import spherify_poses

    rng = np.random.default_rng(3)
    # cameras on a sphere looking inward
    n = 10
    poses = []
    for t in range(n):
        th = 2 * np.pi * t / n
        pos = 3.0 * np.array([np.cos(th), np.sin(th), 0.3])
        z = pos / np.linalg.norm(pos)  # looking through origin
        up = np.array([0, 0, 1.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        poses.append(np.stack([x, y, z, pos], 1))
    poses = np.asarray(poses, np.float32)
    poses = np.concatenate(
        [poses, np.tile(np.array([[24.0], [32.0], [30.0]], np.float32)[None], (n, 1, 1))], -1
    )
    bds = np.tile(np.array([2.0, 6.0], np.float32), (n, 1))
    reset, new_poses, bds2 = spherify_poses(poses, bds)
    # rescaled to ~unit camera radius
    rad = np.sqrt(np.mean(np.sum(reset[:, :3, 3] ** 2, -1)))
    np.testing.assert_allclose(rad, 1.0, atol=1e-5)
    assert new_poses.shape[0] == 120
    assert bds2.shape == bds.shape



def test_parse_synthetic_spec():
    from pronerf_tpu.utils.synthetic import parse_synthetic_spec

    assert parse_synthetic_spec("synthetic") == {
        "n_views": 8, "H": 60, "W": 80, "focal": 70.0
    }
    spec = parse_synthetic_spec("synthetic:504x378x17")
    assert (spec["W"], spec["H"], spec["n_views"]) == (504, 378, 17)
    assert spec["focal"] == 0.875 * 504
