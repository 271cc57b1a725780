"""Golden-value regression: frozen CPU outputs of the three deterministic
pipeline variants for a fixed seed scene. Catches unintended numerical
drift without needing the reference tree (the oracle suite needs it)."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from pronerf_tpu.models import RenderStatics, init_pronerf_params, render_rays
from pronerf_tpu.render.raygen import prepare_scene, rays_for_pose
from pronerf_tpu.utils.synthetic import make_consistent_scene

GOLDEN = Path(__file__).parent / "goldens/render_rays_v1.npz"


def test_render_rays_matches_goldens():
    data = np.load(GOLDEN)
    sc = make_consistent_scene(n_views=5, H=20, W=26, seed=11)
    H, W, _ = sc["hwf"]
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(11))
    rays = rays_for_pose(H, W, sc["K"], sc["poses"][2])
    rays = {k: v[:32] for k, v in rays.items()}
    controls = {
        "rng": jax.random.PRNGKey(0),
        "target_t": jnp.asarray(sc["poses"][2][:3, 3]),
    }
    for name, statics in [
        ("s1_eval", RenderStatics.stage1_sampler(randomize=False)),
        ("s2_eval", RenderStatics.stage2(randomize=False)),
        ("infer", RenderStatics.infer()),
    ]:
        r = render_rays(params, rays, scene, controls, statics)
        np.testing.assert_allclose(
            np.asarray(r["rgb1"]), data[f"{name}_rgb1"], atol=1e-5,
            err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(r["depth"]), data[f"{name}_depth"], atol=1e-4,
            err_msg=name,
        )
