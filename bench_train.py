"""Training-step benchmark (secondary; the driver runs bench.py for the
headline). Prints one JSON line with ms/step for the three compiled steps
at the fern operating point (N_rand=4096, 17 views at 504x378)."""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.config import Config
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.raygen import build_ray_pool
    from pronerf_tpu.train.stage1 import (
        build_stage1_step_fns,
        init_stage1_state,
    )
    from pronerf_tpu.train.stage2 import (
        build_stage2_step_fn,
        init_stage2_state,
    )
    from pronerf_tpu.utils.profiling import readback
    from pronerf_tpu.utils.synthetic import make_scene

    f0 = jax.jit(lambda x: x + 1.0)
    readback(f0(jnp.zeros(())))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        readback(f0(jnp.zeros(())))
        times.append((time.perf_counter() - t0) * 1e3)
    null = float(np.median(times))

    cfg = Config.from_file("configs/llff/fern/fern_epi.txt")
    H, W = 378, 504
    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0), mmnetdepth=6)
    rng = np.random.default_rng(0)
    pool, ids = build_ray_pool(
        sc["images"], sc["poses"], sc["K"], list(range(16)), 4, rng
    )
    batch = jnp.asarray(pool[:4096])
    bids = jnp.asarray(ids[:4096])
    controls = {
        "rng": jax.random.PRNGKey(1),
        "n_mult": jnp.int32(4),
        "dir_expand": jnp.asarray(True),
        "dir_jitter": jnp.asarray(False),
        "neighbor_subset": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "target_t": jnp.zeros((3,), jnp.float32),
    }

    nerf_fn, sampler_fn = build_stage1_step_fns(cfg, H, W, 0.8 * W)
    s2_fn = build_stage2_step_fn(cfg.replace(lrate=3e-4), H, W, 0.8 * W)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    # Time each step CHAINED: the scan carry is the optimizer state, so
    # every iteration truly depends on the previous one. Timing the step
    # unchained (state as a loop-invariant closure constant, carry only
    # folding the scalar loss) lets XLA hoist most of the body out of the
    # loop and reported 8.4 ms/step for a step whose real device cost is
    # ~19 ms (results/probes_r4_step_timing.txt: unchained 15.0 vs
    # chained 34.6 vs independent-dispatch 37.5 ms for the stage-1 NeRF
    # step) — a 2.3x fiction, caught in round 4.
    out = {}
    iters = 12
    for name, fn, state0 in [
        ("stage1_nerf_ms", nerf_fn, init_stage1_state(copy(params))),
        ("stage1_sampler_ms", sampler_fn, init_stage1_state(copy(params))),
        ("stage2_ms", s2_fn, init_stage2_state(copy(params))),
    ]:
        @jax.jit
        def loop(st, fn=fn):
            def body(st, _):
                st, m2 = fn(st, scene, batch, bids, controls, 5e-4)
                return st, m2["loss"]
            st, losses = jax.lax.scan(body, st, None, length=iters)
            return losses.sum()

        readback(loop(state0))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            readback(loop(state0))
            times.append((time.perf_counter() - t0) * 1e3)
        out[name] = round((float(np.median(times)) - null) / iters, 3)

    alt = (out["stage1_nerf_ms"] + out["stage1_sampler_ms"]) / 2
    print(json.dumps({
        "metric": "fern_stage1_alternating_ms_per_step",
        "value": round(alt, 3),
        "unit": "ms",
        "vs_baseline": None,
        "extra": dict(out, n_rand=4096,
                      full_500k_train_minutes=round(alt * 500e3 / 60e3, 1)),
    }))


if __name__ == "__main__":
    main()
