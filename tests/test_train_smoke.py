"""CLI smoke tests mirroring the reference's validation protocol
(SURVEY.md §4): 2-step stage-1 train, 2-step stage-2 train from the stage-1
checkpoint, and a one-image inference render — all CPU, synthetic scene."""

import os
from pathlib import Path

import numpy as np
import pytest

from pronerf_tpu.cli import main


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("smoke")


def _common(basedir, expname):
    return [
        "--synthetic", "--",
        "--basedir", str(basedir),
        "--expname", expname,
        "--N_rand", "128",
        "--i_print", "1",
        "--i_weights", "2",
        "--i_testset", "0",
        "--tile_rays", "512",
    ]


def test_stage1_smoke(workdir, capsys):
    main(
        ["train-stage1", "--no-reload", "--max-steps", "2"]
        + _common(workdir, "s1")
    )
    out = capsys.readouterr().out
    assert "[TRAIN]" in out
    ckpts = sorted((workdir / "s1").glob("*.ckpt"))
    assert ckpts, "no checkpoint written"
    assert (workdir / "s1" / "args.txt").exists()


def test_stage1_resume(workdir, capsys):
    """Auto-resume continues from the saved global step."""
    main(["train-stage1", "--max-steps", "2"] + _common(workdir, "s1"))
    out = capsys.readouterr().out
    assert "Reloading from" in out
    assert "Iter: 3" in out or "Iter: 4" in out


def test_stage2_smoke(workdir, capsys):
    s1_ckpt = sorted((workdir / "s1").glob("*.ckpt"))[-1]
    main(
        ["train-stage2", "--no-reload", "--max-steps", "2",
         "--pretrain-path", str(s1_ckpt)]
        + _common(workdir, "s2")
    )
    out = capsys.readouterr().out
    assert "[TRAIN]" in out
    assert sorted((workdir / "s2").glob("*.ckpt"))


def test_infer_smoke(workdir, capsys):
    s2_ckpt = sorted((workdir / "s2").glob("*.ckpt"))[-1]
    main(
        ["infer", "--render-test", "--max-images", "1",
         "--checkpoint", str(s2_ckpt)]
        + _common(workdir, "inf")
    )
    out = capsys.readouterr().out
    assert "Mean Test PSNR" in out
    assert "Mean Test SSIM" in out
    pngs = list((workdir / "inf" / "renderonly_test").glob("*.png"))
    assert pngs


def test_eval_bf16_smoke(workdir, capsys):
    s2_ckpt = sorted((workdir / "s2").glob("*.ckpt"))[-1]
    main(
        ["eval", "--use-trt", "--max-images", "1",
         "--checkpoint", str(s2_ckpt)]
        + _common(workdir, "inf_bf16")
    )
    out = capsys.readouterr().out
    assert "Mean Test PSNR" in out


def test_metrics_jsonl_and_i_img(workdir):
    import json

    metrics = workdir / "s1" / "metrics.jsonl"
    assert metrics.exists()
    recs = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert any("loss" in r for r in recs)


def test_render_path_video(workdir, capsys):
    s2_ckpt = sorted((workdir / "s2").glob("*.ckpt"))[-1]
    main(
        ["render-path", "--n-frames", "2", "--fps", "4",
         "--checkpoint", str(s2_ckpt)]
        + _common(workdir, "vid")
    )
    out = capsys.readouterr().out
    assert "Saved render path video" in out
    vids = list((workdir / "vid").glob("render_path.*"))
    assert vids
