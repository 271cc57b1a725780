from pathlib import Path

from pronerf_tpu.config import Config, parse_config_file

CONFIGS = Path(__file__).resolve().parents[1] / "configs/llff/fern"


def test_fern_epi_loads_verbatim():
    cfg = Config.from_file(CONFIGS / "fern_epi.txt")
    assert cfg.expname == "fern_sampler_e2e_donerf_8samples_cc"
    assert cfg.factor == 4
    assert cfg.llffhold == 8
    assert cfg.N_rand == 4096
    assert cfg.N_samples == 8
    assert cfg.N_importance == 0
    assert cfg.use_viewdirs is True
    assert cfg.raw_noise_std == 1.0
    assert cfg.lrate == 5e-4
    assert cfg.a_mmrgb == 1.0
    assert cfg.mmnetdepth == 6
    assert cfg.mmnetwidth == 256
    assert cfg.mmnetskips == [1000]   # list syntax must parse
    assert cfg.N_point_ray_enc == 48
    assert cfg.mm_emb is False
    assert cfg.weight_decay == 0.0    # '0e-7'
    assert cfg.num_neighbor == 4


def test_fern_refine_loads():
    cfg = Config.from_file(CONFIGS / "fern_refine.txt")
    assert cfg.lrate == 3e-4
    assert cfg.a_mmrgb == 0.0
    assert cfg.mmnetskips == [10000]
    assert cfg.pretrain_path.endswith("500000.tar")
    assert cfg.k_ref == 1


def test_fern_trt_loads():
    cfg = Config.from_file(CONFIGS / "fern_trt.txt")
    assert cfg.use_trt is False
    assert cfg.ft_path.endswith("370000.tar")
    assert cfg.weight_decay == 5e-8
    assert cfg.nerf_engine_path is not None


def test_overrides_and_unknown_key():
    cfg = Config.from_file(CONFIGS / "fern_epi.txt", max_steps=2, no_reload=True)
    assert cfg.max_steps == 2 and cfg.no_reload is True
    import pytest

    with pytest.raises(KeyError):
        bad = CONFIGS / "fern_epi.txt"
        values = parse_config_file(bad)
        values["not_a_flag"] = "1"
        import tempfile, os

        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            for k, v in values.items():
                f.write(f"{k} = {v}\n")
            name = f.name
        try:
            Config.from_file(name)
        finally:
            os.unlink(name)


def test_comments_and_blank_lines():
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("# a comment\n\nN_samples = 16  # trailing\n")
        name = f.name
    try:
        assert parse_config_file(name) == {"N_samples": "16"}
    finally:
        os.unlink(name)
