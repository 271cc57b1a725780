"""TPU A/B for the bucketed stage-1 exploration (``Config.explore_buckets``).

Times the REAL scan executor (``train/fast_loop.py``) chunk — alternating
NeRF + sampler steps, n_mult drawn in-graph per step exactly as training
does — with the bucketed lax.switch step vs the masked static-64 step.
The expected win: the NeRF fwd+bwd runs at E[width] ~ 43 of 64 slots
(n_mult ~ U{1..8} -> widths 8/16/32/64 with P = 1/8, 1/8, 2/8, 4/8).

Usage: python scripts/probe_explore_buckets.py [--scan 50] [--reps 3]
Appends JSON lines to results/probes_r4_explore_buckets.txt.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / "results/probes_r4_explore_buckets.txt"


def emit(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def measure(explore_buckets: bool, scan_steps: int, reps: int):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.config import Config
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.raygen import build_ray_pool
    from pronerf_tpu.train.fast_loop import make_scan_executor
    from pronerf_tpu.train.stage1 import init_stage1_state
    from pronerf_tpu.utils.profiling import null_dispatch_ms, readback
    from pronerf_tpu.utils.synthetic import make_scene

    cfg = Config.from_file("configs/llff/fern/fern_epi.txt")
    cfg.explore_buckets = explore_buckets
    H, W = 378, 504
    sc = make_scene(n_views=17, H=H, W=W, focal=0.8 * W, seed=0)
    scene = prepare_scene(sc["images"], sc["poses"], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0), mmnetdepth=6)
    rng = np.random.default_rng(0)
    pool, ids = build_ray_pool(
        sc["images"], sc["poses"], sc["K"], list(range(16)), 4, rng
    )
    pool, ids = jnp.asarray(pool), jnp.asarray(ids)
    executor = make_scan_executor(
        cfg, H, W, 0.8 * W, n_train=16, stage=1, scan_steps=scan_steps
    )
    state = init_stage1_state(params)
    t0 = time.time()
    state, m = executor(state, scene, pool, ids, 0, jax.random.PRNGKey(0))
    readback(m["mean_loss"])
    compile_s = time.time() - t0
    null = null_dispatch_ms()
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        state, m = executor(
            state, scene, pool, ids, (r + 1) * scan_steps * cfg.N_rand
            % (pool.shape[0] - scan_steps * cfg.N_rand),
            jax.random.PRNGKey(r + 1),
        )
        readback(m["mean_loss"])
        times.append((time.perf_counter() - t0) * 1e3)
    ms_step = (float(np.median(times)) - null) / scan_steps
    emit({
        "explore_buckets": explore_buckets, "scan_steps": scan_steps,
        "alternating_ms_per_step": round(ms_step, 3),
        "null_ms": round(null, 2), "compile_s": round(compile_s, 1),
        "mean_loss": round(float(m["mean_loss"]), 6),
        "reps_ms": [round(t, 1) for t in times],
    })
    return ms_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    base = measure(False, args.scan, args.reps)
    buck = measure(True, args.scan, args.reps)
    emit({"speedup": round(base / buck, 3)})


if __name__ == "__main__":
    main()
