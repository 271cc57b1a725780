"""Phase-timing probe for the fern-scale training setup: where do the
minutes go before the first step runs? Prints one JSON line per phase.

Usage: python scripts/probe_train_stall.py [WxHxV] [chunk]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SPEC = sys.argv[1] if len(sys.argv) > 1 else "504x378x17"
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 10

_t = time.time()


def mark(name, **kw):
    global _t
    now = time.time()
    print(json.dumps({"phase": name, "s": round(now - _t, 1), **kw}),
          flush=True)
    _t = now


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.cli import DEFAULT_STAGE1_CONFIG, enable_compilation_cache
    from pronerf_tpu.config import Config
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render.raygen import build_ray_pool, prepare_scene
    from pronerf_tpu.train.fast_loop import make_scan_executor
    from pronerf_tpu.train.stage1 import init_stage1_state
    from pronerf_tpu.utils.profiling import readback
    from pronerf_tpu.utils.synthetic import (
        make_consistent_scene,
        parse_synthetic_spec,
    )

    enable_compilation_cache()
    jax.devices()
    mark("jax_init")

    cfg = Config.from_file(
        DEFAULT_STAGE1_CONFIG, datadir=f"synthetic:{SPEC}", scan_steps=CHUNK
    )
    sc = make_consistent_scene(seed=0, **parse_synthetic_spec(cfg.datadir))
    H, W, focal = sc["hwf"]
    mark("scene_build_host", views=len(sc["images"]), res=f"{W}x{H}")

    i_train = list(range(1, len(sc["images"])))
    scene = prepare_scene(sc["images"][i_train], sc["poses"][i_train], sc["K"])
    readback(scene["images"][0, 0, 0, 0])
    mark("prepare_scene_device",
         table_mb=round(np.prod(scene["images"].shape) * 4 / 1e6, 1))

    rng = np.random.default_rng(0)
    pool, pool_ids = build_ray_pool(
        sc["images"], sc["poses"], sc["K"], i_train, cfg.num_neighbor, rng
    )
    mark("build_ray_pool_host", rays=int(pool.shape[0]),
         mb=round(pool.nbytes / 1e6, 1))

    pool_j = jnp.asarray(pool)
    ids_j = jnp.asarray(pool_ids)
    readback(pool_j[0, 0, 0] + jnp.float32(ids_j[0]))
    mark("pool_transfer_device")

    params = init_pronerf_params(jax.random.PRNGKey(0))
    state = init_stage1_state(params, cfg.weight_decay)
    executor = make_scan_executor(cfg, H, W, focal, len(i_train), 1, CHUNK)
    base_key = jax.random.PRNGKey(123)
    state, m = executor(state, scene, pool_j, ids_j, 0, base_key)
    readback(m["mean_loss"])
    mark("compile_plus_first_chunk")

    for rep in range(3):
        t0 = time.time()
        state, m = executor(state, scene, pool_j, ids_j, 0, base_key)
        readback(m["mean_loss"])
        mark(f"warm_chunk_{rep}", ms_per_step=round(
            (time.time() - t0) * 1e3 / CHUNK, 2))

    # the reshuffle + re-upload the driver pays every pool exhaustion
    t0 = time.time()
    perm = rng.permutation(pool.shape[0])
    pool2, ids2 = pool[perm], pool_ids[perm]
    mark("host_reshuffle")
    pool_j2, ids_j2 = jnp.asarray(pool2), jnp.asarray(ids2)
    readback(pool_j2[0, 0, 0] + jnp.float32(ids_j2[0]))
    mark("pool_retransfer", total_reshuffle_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
