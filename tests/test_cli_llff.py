"""CLI integration on a REAL on-disk LLFF dataset (poses_bounds.npy +
images/ + sparse/0 COLMAP model): the full reference workflow —
train-stage1 -> train-stage2 (pretrain bootstrap) -> infer with greedy
COLMAP reference-view selection. Complements the synthetic-scene smokes."""

import numpy as np
import pytest

from pronerf_tpu.cli import main
from tests.test_data import _write_colmap_model, _write_llff_dataset


@pytest.fixture(scope="module")
def llff_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("llff_ds")
    _write_llff_dataset(root, n=8, H=32, W=40, focal=36.0)
    _write_colmap_model(root, n_images=8, n_points=50)
    return root


def _common(root, basedir, expname):
    return [
        "--",
        "--datadir", str(root),
        "--factor", "1",
        "--basedir", str(basedir),
        "--expname", expname,
        "--N_rand", "128",
        "--i_print", "1",
        "--i_weights", "2",
        "--i_testset", "0",
        "--tile_rays", "512",
    ]


def test_full_llff_workflow(llff_root, tmp_path, capsys):
    main(
        ["train-stage1", "--no-reload", "--max-steps", "2"]
        + _common(llff_root, tmp_path, "s1")
    )
    s1 = sorted((tmp_path / "s1").glob("*.ckpt"))[-1]
    main(
        ["train-stage2", "--no-reload", "--max-steps", "2",
         "--pretrain-path", str(s1)]
        + _common(llff_root, tmp_path, "s2")
    )
    s2 = sorted((tmp_path / "s2").glob("*.ckpt"))[-1]
    capsys.readouterr()
    main(
        ["infer", "--render-test", "--max-images", "1",
         "--checkpoint", str(s2)]
        + _common(llff_root, tmp_path, "inf")
    )
    out = capsys.readouterr().out
    assert "Mean Test PSNR" in out
    # COLMAP greedy selection ran (i_ref views feed the scene)
    pngs = list((tmp_path / "inf" / "renderonly_test").glob("*.png"))
    assert pngs
    # expdir contract
    for f in ("args.txt",):
        assert (tmp_path / "inf" / f).exists()

    # export at the data resolution, then SERVE from the artifact
    # (the reference runs its TRT engines; we run the AOT executable)
    main(
        ["export", "--checkpoint", str(s2), "--height", "32", "--width", "40"]
        + _common(llff_root, tmp_path, "exp")
    )
    export_dir = tmp_path / "exp" / "export"
    assert (export_dir / "render_frame.xla").exists()
    capsys.readouterr()
    main(
        ["infer", "--from-export", str(export_dir), "--max-images", "1"]
        + _common(llff_root, tmp_path, "exp")
    )
    out = capsys.readouterr().out
    assert "Mean Test PSNR" in out
    assert list((tmp_path / "exp" / "export_test").glob("*.png"))
