import numpy as np
import jax

from pronerf_tpu.tools.ckpt import diff, show
from pronerf_tpu.train.checkpoint import save_checkpoint
from pronerf_tpu.utils.profiling import pipeline_macs


def _ckpt(tmp_path, name, scale=1.0):
    from pronerf_tpu.models import init_pronerf_params

    params = init_pronerf_params(jax.random.PRNGKey(0), mmnetdepth=6)
    params = jax.tree_util.tree_map(lambda a: a * scale, params)
    path = tmp_path / name
    save_checkpoint(path, {
        "global_step": np.int32(7),
        "network_fn": params["nerf"],
        "mmr_network_fn": params["sampler"],
        "refine_net": params["refine"],
    })
    return path


def test_ckpt_show_and_diff(tmp_path, capsys):
    a = _ckpt(tmp_path, "a.ckpt")
    b = _ckpt(tmp_path, "b.ckpt", scale=1.1)
    show(a)
    out = capsys.readouterr().out
    assert "global_step: 7" in out
    assert "network_fn" in out and "595,844" in out
    diff(a, b)
    out = capsys.readouterr().out
    assert "max|delta|" in out


def test_pipeline_macs_matches_param_scale():
    macs = pipeline_macs(378, 504)
    # NeRF ~0.59M params -> MACs per point ~ param count (dense layers);
    # per frame: rays * 8 samples
    rays = 378 * 504
    per_point = macs["nerf"] / (rays * 8)
    assert 5.5e5 < per_point < 6.5e5
    per_ray_sampler = macs["sampler"] / rays
    assert 3.9e5 < per_ray_sampler < 4.3e5  # ~410k params
    per_ray_refine = macs["refine"] / rays
    assert 3.5e5 < per_ray_refine < 3.9e5  # ~375k params


def test_bench_codesign_quality_parser(tmp_path):
    """bench.py attaches the fast-point PSNR delta only when BOTH the
    control (8,4) and candidate (8,2) quality rows exist in the probe
    artifact, and ignores malformed/latency lines."""
    import bench

    p = tmp_path / "probe.txt"
    p.write_text(
        '{"phase": "latency", "S": 8, "V": 2, "ms": 98.7}\n'
        "not json\n"
        '{"phase": "quality", "S": 8, "V": 4, "schedule": "30000+15000",'
        ' "psnr_rgb1": 30.10}\n'
    )
    assert bench._codesign_quality_delta(str(p)) == {}  # no candidate yet

    with open(p, "a") as f:
        f.write('{"phase": "quality", "S": 8, "V": 2, "schedule":'
                ' "30000+15000", "psnr_rgb1": 29.62}\n')
    out = bench._codesign_quality_delta(str(p))
    assert out["fast_v2_psnr_delta_db"] == -0.48
    assert "30000+15000" in out["fast_v2_quality_protocol"]

    assert bench._codesign_quality_delta(str(tmp_path / "absent.txt")) == {}


def test_v2_surgery_roundtrip(tmp_path):
    """probe_v2_surgery.do_surgery: a V=4 stage-2 checkpoint becomes a
    V=2 stage-1-layout bootstrap ckpt — plk rows copied, nearest-2 view
    rows kept and rescaled, trained nerf/sampler carried over — and the
    result loads through the exact --pretrain-path path and renders."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from scripts.probe_v2_surgery import do_surgery

    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.train.loop import stage1_restore, stage2_ckpt
    from pronerf_tpu.train.stage1 import init_stage1_state
    from pronerf_tpu.train.stage2 import init_stage2_state

    p4 = init_pronerf_params(jax.random.PRNGKey(3), num_neighbor=4)
    st = init_stage2_state(p4, 0.0)
    vest = init_pronerf_params(jax.random.PRNGKey(9), num_neighbor=4)["nerf"]
    save_checkpoint(tmp_path / "000042.ckpt", stage2_ckpt(st, vest))

    dst = tmp_path / "v2.ckpt"
    do_surgery(tmp_path, dst, 2.0)

    p2 = init_pronerf_params(jax.random.PRNGKey(0), num_neighbor=2)
    s1 = stage1_restore(dst, init_stage1_state(p2, 0.0))
    w1 = np.asarray(s1["params"]["refine"]["layers"][0]["w"])
    w1_src = np.asarray(p4["refine"]["layers"][0]["w"])
    assert w1.shape == (96, 256)
    np.testing.assert_allclose(w1[:48], w1_src[:48])
    np.testing.assert_allclose(w1[48:], 2.0 * w1_src[48:96])
    np.testing.assert_allclose(
        np.asarray(s1["params"]["nerf"]["rgb"]["w"]),
        np.asarray(p4["nerf"]["rgb"]["w"]),
    )

    # generalized target width: V=3 keeps the nearest-3 prefix
    dst3 = tmp_path / "v3.ckpt"
    # explicit source file: the dir's "latest" is now the v2 result
    do_surgery(tmp_path / "000042.ckpt", dst3, 4.0 / 3, views=3)
    p3 = init_pronerf_params(jax.random.PRNGKey(0), num_neighbor=3)
    s3 = stage1_restore(dst3, init_stage1_state(p3, 0.0))
    w13 = np.asarray(s3["params"]["refine"]["layers"][0]["w"])
    assert w13.shape == (48 + 72, 256)
    np.testing.assert_allclose(w13[:48], w1_src[:48])
    np.testing.assert_allclose(w13[48:], (4.0 / 3) * w1_src[48:120],
                               rtol=1e-6)


def test_bench_codesign_delta_is_schedule_matched(tmp_path):
    """Round-4 regression: a mixed-schedule probe file must never produce
    a cross-schedule delta. Rows pair by (S, V, schedule); the reported
    delta is the LONGEST schedule with both arms, and the per-schedule
    trend is attached."""
    import bench

    p = tmp_path / "probe.txt"
    # 60k control present but its candidate MISSING; 30k pair complete.
    # The r4 bug paired 60k-control with 30k-candidate (-1.75-style ghost).
    p.write_text(
        '{"phase": "quality", "S": 8, "V": 4, "schedule": "30000+15000",'
        ' "psnr_rgb1": 35.91}\n'
        '{"phase": "quality", "S": 8, "V": 2, "schedule": "30000+15000",'
        ' "psnr_rgb1": 34.66}\n'
        '{"phase": "quality", "S": 8, "V": 4, "schedule": "60000+30000",'
        ' "psnr_rgb1": 36.41}\n'
    )
    out = bench._codesign_quality_delta(str(p))
    assert out["fast_v2_psnr_delta_db"] == -1.25  # the matched 30k pair
    assert "30000+15000" in out["fast_v2_quality_protocol"]

    # Candidate's 60k row arrives: the longer matched schedule wins and
    # the trend carries both points.
    with open(p, "a") as f:
        f.write('{"phase": "quality", "S": 8, "V": 2, "schedule":'
                ' "60000+30000", "psnr_rgb1": 34.39}\n')
    out = bench._codesign_quality_delta(str(p))
    assert out["fast_v2_psnr_delta_db"] == -2.02
    assert "60000+30000" in out["fast_v2_quality_protocol"]
    assert out["fast_v2_delta_trend_db"] == {
        "30000+15000": -1.25, "60000+30000": -2.02}


def test_bench_v_curve_summary(tmp_path):
    """bench._v_curve_summary assembles the per-V operating-point table
    from committed probe rows: newest full-res latency per V, scratch
    quality at the LONGEST schedule probed, surgery quality where present
    (keyed by 'views', defaulting to 2 for the original V=2 row)."""
    import bench

    p = tmp_path / "probe.txt"
    p.write_text(
        '{"phase": "latency", "S": 8, "V": 4, "res": "1008x756",'
        ' "ms": 140.0, "mrays_per_sec": 5.4}\n'
        '{"phase": "latency", "S": 8, "V": 4, "res": "1008x756",'
        ' "ms": 134.5, "mrays_per_sec": 5.67}\n'  # newer row wins
        '{"phase": "latency", "S": 8, "V": 2, "res": "504x378",'
        ' "ms": 21.6, "mrays_per_sec": 8.8}\n'  # wrong res: ignored
        '{"phase": "latency", "S": 6, "V": 2, "res": "1008x756",'
        ' "ms": 91.9, "mrays_per_sec": 8.3}\n'  # S!=8: ignored
        '{"phase": "latency", "S": 8, "V": 1, "res": "1008x756",'
        ' "ms": 80.1, "mrays_per_sec": 9.51}\n'
        '{"phase": "quality", "S": 8, "V": 4, "schedule": "30000+15000",'
        ' "psnr_rgb1": 35.91}\n'
        '{"phase": "quality", "S": 8, "V": 4, "schedule": "120000+60000",'
        ' "psnr_rgb1": 35.28}\n'
    )
    (tmp_path / "probes_r5_surgery.txt").write_text(
        '{"phase": "surgery_v2", "scale": 4.0, "views": 1,'
        ' "psnr_rgb1": 35.316}\n'
        '{"phase": "surgery_v2", "scale": 2.0, "psnr_rgb1": 34.39}\n'
    )
    out = bench._v_curve_summary(str(p))
    curve = out["v_curve_1008x756"]
    assert set(curve) == {"1", "4"}
    assert curve["4"]["full_res_ms"] == 134.5  # the newest row
    assert curve["4"]["scratch_psnr_db"] == 35.28  # longest schedule
    assert curve["4"]["scratch_schedule"] == "120000+60000"
    assert curve["1"]["surgery_psnr_db"] == 35.32
    assert "scratch_psnr_db" not in curve["1"]
    # no latency artifact -> no v_curve fields at all
    assert bench._v_curve_summary(str(tmp_path / "absent.txt")) == {}


def test_xplane_aggregation_excludes_control_flow_parents():
    """The xplane "XLA Ops" line emits while/conditional/call parents'
    INCLUSIVE durations alongside their children; counting both
    double-counts the loop body (the round-5 "while: 50%" artifact).
    Parents must be visible under "<cat> (inclusive)" but excluded from
    total_ns and the leaf categories."""
    from pronerf_tpu.utils.profiling import aggregate_xplane_events

    def category(name):
        head = name.lstrip("%").split(" ")[0].split(".")[0]
        for stem in ("fused_nerf", "while", "conditional", "call", "copy"):
            if head.startswith(stem):
                return stem
        return "fusion" if "fusion" in head else head

    events = [
        ("%fused_nerf.1", 700),
        ("%copy.3", 200),
        ("%loop_body_fusion.2", 100),
        ("%while.1", 1000),        # inclusive parent == sum of children
        ("%conditional.7", 50),
        ("%call.2", 25),
    ]
    per_cat, per_op, total = aggregate_xplane_events(events, category)
    assert total == 1000  # leaves only; parents never double-count
    assert per_cat["fused_nerf"] == 700
    assert per_cat["copy"] == 200
    assert per_cat["fusion"] == 100
    # parents stay visible, under the explicit inclusive key
    assert per_cat["while (inclusive)"] == 1000
    assert per_cat["conditional (inclusive)"] == 50
    assert per_cat["call (inclusive)"] == 25
    assert "while" not in per_cat and "call" not in per_cat
    assert "%while.1" not in per_op
