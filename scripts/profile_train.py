"""Op-level TPU profile of the stage-1 TRAINING chunk (scan executor).

Diagnoses where the fern-scale marginal step time goes (STATUS open item:
43 ms/step at synthetic:504x378x17 vs 8.4 ms on the 80x60 scene — the
isolated warp A/B already ruled out the gather). Same xplane parsing as
scripts/profile_ops.py but over one scan-executor chunk.

Usage: python scripts/profile_train.py [WxHxV] [chunk] [top_n]
"""

from __future__ import annotations

import collections
import glob
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SPEC = sys.argv[1] if len(sys.argv) > 1 else "504x378x17"
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 10
TOP_N = int(sys.argv[3]) if len(sys.argv) > 3 else 30


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.cli import DEFAULT_STAGE1_CONFIG, enable_compilation_cache

    enable_compilation_cache()
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

    cfg = Config.from_file(
        DEFAULT_STAGE1_CONFIG, datadir=f"synthetic:{SPEC}", scan_steps=CHUNK
    )
    sc = make_consistent_scene(seed=0, **parse_synthetic_spec(cfg.datadir))
    H, W, focal = sc["hwf"]
    i_train = list(range(1, len(sc["images"])))  # hold out view 0
    scene = prepare_scene(sc["images"][i_train], sc["poses"][i_train], sc["K"])
    params = init_pronerf_params(jax.random.PRNGKey(0))
    state = init_stage1_state(params, cfg.weight_decay)

    rng = np.random.default_rng(0)
    pool, pool_ids = build_ray_pool(
        sc["images"], sc["poses"], sc["K"], i_train, cfg.num_neighbor, rng
    )
    pool_j, ids_j = jnp.asarray(pool), jnp.asarray(pool_ids)

    executor = make_scan_executor(cfg, H, W, focal, len(i_train), 1, CHUNK)
    base_key = jax.random.PRNGKey(123)

    def run():
        nonlocal state
        state, m = executor(state, scene, pool_j, ids_j, 0, base_key)
        readback(m["mean_loss"])

    t0 = time.time()
    run()  # compile + warm
    print(json.dumps({"compile_plus_first_s": round(time.time() - t0, 1)}))
    t0 = time.time()
    run()
    warm_s = time.time() - t0
    print(json.dumps({
        "spec": SPEC, "chunk": CHUNK,
        "warm_chunk_ms": round(warm_s * 1e3, 1),
        "ms_per_step_incl_dispatch": round(warm_s * 1e3 / CHUNK, 2),
    }))

    tmp = tempfile.mkdtemp(prefix="jaxprof_train_")
    with jax.profiler.trace(tmp):
        run()

    files = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)
    if not files:
        raise SystemExit(f"no xplane.pb under {tmp}")
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read()
    )
    per_op = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
    total = sum(per_op.values())
    print(json.dumps({
        "total_device_ms_chunk": round(total / 1e6, 2),
        "device_ms_per_step": round(total / 1e6 / CHUNK, 3),
    }))
    for name, ns in per_op.most_common(TOP_N):
        print(json.dumps({
            "op": name[:110],
            "ms_per_step": round(ns / 1e6 / CHUNK, 3),
            "pct": round(100 * ns / total, 1),
        }))


if __name__ == "__main__":
    main()
