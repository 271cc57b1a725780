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


def test_colmap_text_readers_match_binary(tmp_path):
    """Text and binary encodings of the same model parse identically
    (images: id/qvec/tvec/camera/name; points3D: xyz/rgb/error/tracks).
    Parity surface: colmap_utils.py:82-269 read_model dispatch."""
    from pronerf_tpu.data.colmap import (
        read_cameras_text,
        read_images_text,
        read_model,
        read_points3d_text,
    )

    bin_root = tmp_path / "bin"
    txt_root = tmp_path / "txt"
    _write_colmap_model(bin_root, ext=".bin")
    _write_colmap_model(txt_root, ext=".txt")

    ims_b = read_images_binary(bin_root / "sparse/0/images.bin")
    ims_t = read_images_text(txt_root / "sparse/0/images.txt")
    assert sorted(ims_b) == sorted(ims_t)
    for k in ims_b:
        assert ims_b[k].name == ims_t[k].name
        assert ims_b[k].camera_id == ims_t[k].camera_id
        np.testing.assert_allclose(ims_b[k].qvec, ims_t[k].qvec)
        np.testing.assert_allclose(ims_b[k].tvec, ims_t[k].tvec)
    # the text fixture carries keypoints the binary one omits: empty line
    # for image 1, one (x, y, point3d_id) triple for the rest
    assert ims_t[1].point3d_ids.shape == (0,)
    assert ims_t[2].xys.shape == (1, 2) and ims_t[2].point3d_ids[0] == 1

    pts_b = read_points3d_binary(bin_root / "sparse/0/points3D.bin")
    pts_t = read_points3d_text(txt_root / "sparse/0/points3D.txt")
    assert sorted(pts_b) == sorted(pts_t)
    for k in pts_b:
        np.testing.assert_allclose(pts_b[k].xyz, pts_t[k].xyz)
        np.testing.assert_array_equal(pts_b[k].rgb, pts_t[k].rgb)
        assert pts_b[k].error == pts_t[k].error
        np.testing.assert_array_equal(pts_b[k].image_ids, pts_t[k].image_ids)
        np.testing.assert_array_equal(
            pts_b[k].point2d_idxs, pts_t[k].point2d_idxs)

    cams = read_cameras_text(txt_root / "sparse/0/cameras.txt")
    assert cams[1].model == "PINHOLE" and cams[1].width == 32
    np.testing.assert_allclose(cams[1].params, [30.0, 30.0, 16.0, 12.0])

    # read_model auto-detects the encoding from the files present
    _, ims_auto, pts_auto = read_model(txt_root / "sparse/0")
    assert sorted(ims_auto) == sorted(ims_t) and len(pts_auto) == len(pts_t)


def test_greedy_reference_views_text_model(tmp_path):
    """The release infer path's greedy cover works on a text-only model
    (the reference reads both encodings, colmap_utils.py:262-269)."""
    _write_colmap_model(tmp_path, ext=".txt")
    i_train = [0, 1, 2, 3, 4]
    refs = greedy_reference_views(tmp_path / "sparse/0", i_train, 2)
    assert refs[0] == 4 and len(refs) == 2 and refs[1] != refs[0]


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
