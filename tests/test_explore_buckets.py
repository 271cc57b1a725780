"""Bucketed stage-1 exploration (``Config.explore_buckets``): the
lax.switch-over-widths NeRF step must match the masked static-64 step.

Invariants tested:
- ops-level width invariance: with the noise streams pre-drawn at the full
  width and sliced (``controls['jitter_noise'] / ['raw_noise']``),
  ``render_rays`` at ``max_expand = w`` equals ``max_expand = 64`` for any
  n_mult with S * n_mult <= w — the parked-at-far slots beyond w carry zero
  composite weight and identical per-slot noise;
- step-level: at the widest bucket (n_mult = max) the bucketed step is
  numerically identical to the plain static-64 step (same keys, same
  draws);
- no retrace: one executable serves every n_mult (the branch index is
  traced).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pronerf_tpu.config import Config
from pronerf_tpu.models import init_pronerf_params
from pronerf_tpu.models.pronerf import RenderStatics, render_rays
from pronerf_tpu.render import prepare_scene
from pronerf_tpu.render.raygen import build_ray_pool, rays_from_pool
from pronerf_tpu.train import init_stage1_state, make_stage1_steps
from pronerf_tpu.utils.synthetic import make_scene


def _setup(n_rand=64):
    cfg = Config()
    cfg.N_samples, cfg.N_point_ray_enc, cfg.num_neighbor = 8, 48, 4
    cfg.mmnetdepth, cfg.raw_noise_std = 6, 1.0
    sc = make_scene(n_views=6, H=20, W=24, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0), mmnetdepth=6)
    rng = np.random.default_rng(0)
    pool, ids = build_ray_pool(
        sc["images"], sc["poses"], sc["K"], list(range(6)), 4, rng
    )
    return cfg, sc, scene, params, pool[:n_rand], ids[:n_rand]


def _controls(n_mult, n, me=64, key=3):
    rng = jax.random.PRNGKey(key)
    nk, jk = jax.random.split(rng)
    return {
        "rng": rng,
        "n_mult": jnp.int32(n_mult),
        "dir_expand": jnp.asarray(True),
        "dir_jitter": jnp.asarray(False),
        "neighbor_subset": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "target_t": jnp.zeros((3,), jnp.float32),
        "raw_noise": jax.random.normal(nk, (n, me), jnp.float32),
        "jitter_noise": jax.random.normal(jk, (n, me), jnp.float32),
    }


def test_render_width_invariance_with_sliced_noise():
    cfg, sc, scene, params, pool, ids = _setup()
    H, W, focal = sc["hwf"]
    rays = rays_from_pool(jnp.asarray(pool[:, :2]), jnp.asarray(ids),
                          H, W, focal)
    statics = RenderStatics.stage1_nerf(
        noise_std=1.0, N_samples=8, N_point_ray_enc=48, num_neighbor=4
    )
    for n_mult, width in ((1, 8), (2, 16), (3, 32), (5, 64)):
        ctl = _controls(n_mult, pool.shape[0])
        out64 = render_rays(params, rays, scene, ctl, statics)
        out_w = render_rays(
            params, rays, scene, ctl,
            dataclasses.replace(statics, max_expand=width),
        )
        np.testing.assert_allclose(
            np.asarray(out64["rgb1"]), np.asarray(out_w["rgb1"]),
            atol=1e-5, err_msg=f"n_mult={n_mult} width={width}",
        )


def test_bucketed_step_matches_static_at_widest():
    cfg, sc, scene, params, pool, ids = _setup()
    H, W, focal = sc["hwf"]
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    ctl = {k: v for k, v in _controls(8, pool.shape[0]).items()
           if k not in ("raw_noise", "jitter_noise")}

    state_a = init_stage1_state(copy(params))
    nerf_a, _ = make_stage1_steps(cfg, H, W, focal)
    state_a, m_a = nerf_a(
        state_a, scene, jnp.asarray(pool), jnp.asarray(ids), ctl, 5e-4
    )

    cfg_b, *_ = _setup()
    cfg_b.explore_buckets = True
    state_b = init_stage1_state(copy(params))
    nerf_b, _ = make_stage1_steps(cfg_b, H, W, focal)
    state_b, m_b = nerf_b(
        state_b, scene, jnp.asarray(pool), jnp.asarray(ids), ctl, 5e-4
    )

    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6
    )
    wa = np.asarray(state_a["params"]["nerf"]["pts"][0]["w"])
    wb = np.asarray(state_b["params"]["nerf"]["pts"][0]["w"])
    np.testing.assert_allclose(wa, wb, atol=2e-7)


def test_bucketed_step_no_retrace_and_finite_all_buckets():
    cfg, sc, scene, params, pool, ids = _setup()
    H, W, focal = sc["hwf"]
    cfg.explore_buckets = True
    state = init_stage1_state(params)
    nerf_fn, _ = make_stage1_steps(cfg, H, W, focal)
    for n_mult in (1, 2, 3, 4, 5, 8):
        ctl = {k: v for k, v in _controls(n_mult, pool.shape[0]).items()
               if k not in ("raw_noise", "jitter_noise")}
        state, m = nerf_fn(
            state, scene, jnp.asarray(pool), jnp.asarray(ids), ctl, 5e-4
        )
        assert np.isfinite(float(m["loss"])), f"n_mult={n_mult}"
    assert nerf_fn._cache_size() == 1
