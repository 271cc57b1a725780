"""Op-level TPU profile of the stage-1 TRAINING step at a given synthetic
operating point — the tool VERDICT r3 weak-3 asks for: name the cost
category behind the fern-scale marginal step (23 ms at 504x378x17 vs
8.4 ms small-scene).

Profiles the scan executor's warm chunk (the exact graph the soak ran)
and prints per-category device time normalized PER STEP, plus the top
ops. Run at two specs and diff the categories:

  python scripts/profile_train_ops.py 80x60x8
  python scripts/profile_train_ops.py 504x378x17

Usage: python scripts/profile_train_ops.py [WxHxV] [chunk] [top_n]
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SPEC = sys.argv[1] if len(sys.argv) > 1 else "504x378x17"
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 20
TOP_N = int(sys.argv[3]) if len(sys.argv) > 3 else 30


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.cli import DEFAULT_STAGE1_CONFIG, enable_compilation_cache
    from pronerf_tpu.config import Config
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render.raygen import build_ray_pool, prepare_scene
    from pronerf_tpu.train.fast_loop import make_scan_executor
    from pronerf_tpu.train.stage1 import init_stage1_state
    from pronerf_tpu.utils.profiling import readback, xplane_categories
    from pronerf_tpu.utils.synthetic import (
        make_consistent_scene,
        parse_synthetic_spec,
    )

    enable_compilation_cache()
    cfg = Config.from_file(
        DEFAULT_STAGE1_CONFIG, datadir=f"synthetic:{SPEC}", scan_steps=CHUNK
    )
    sc = make_consistent_scene(seed=0, **parse_synthetic_spec(cfg.datadir))
    H, W, focal = sc["hwf"]
    i_train = list(range(1, len(sc["images"])))
    scene = prepare_scene(sc["images"][i_train], sc["poses"][i_train],
                          sc["K"])
    rng = np.random.default_rng(0)
    pool, pool_ids = build_ray_pool(
        sc["images"], sc["poses"], sc["K"], i_train, cfg.num_neighbor, rng
    )
    pool_j, ids_j = jnp.asarray(pool), jnp.asarray(pool_ids)
    params = init_pronerf_params(jax.random.PRNGKey(0))
    state = init_stage1_state(params, cfg.weight_decay)
    executor = make_scan_executor(cfg, H, W, focal, len(i_train), 1, CHUNK)
    base_key = jax.random.PRNGKey(123)
    state, m = executor(state, scene, pool_j, ids_j, 0, base_key)
    readback(m["mean_loss"])  # compile + warm

    holder = {"state": state}

    def step(i):
        s, m = executor(holder["state"], scene, pool_j, ids_j, 0, base_key)
        readback(m["mean_loss"])
        holder["state"] = s

    iters = 3
    per_cat, per_op, total = xplane_categories(step, iters=iters)
    n_steps = iters * CHUNK
    for cat, ns in per_cat.most_common():
        print(json.dumps({
            "category": cat,
            "ms_per_step": round(ns / n_steps / 1e6, 4),
            "pct": round(100 * ns / total, 1),
        }), flush=True)
    print(json.dumps({"spec": SPEC, "chunk": CHUNK,
                      "device_ms_per_step": round(total / n_steps / 1e6, 3)}),
          flush=True)
    for name, ns in per_op.most_common(TOP_N):
        print(json.dumps({
            "op": name[:110],
            "ms_per_step": round(ns / n_steps / 1e6, 4),
            "pct": round(100 * ns / total, 1),
        }), flush=True)
    print("EXIT:0", flush=True)


if __name__ == "__main__":
    main()
