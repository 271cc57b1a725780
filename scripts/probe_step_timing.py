"""Decisive timing probe for the stage-1 step: is the 8.4 ms/step
"small-scene" figure real, or an artifact of timing an UNCHAINED step
inside a lax.scan (loop-invariant inputs -> XLA hoists/CSEs the body)?

Three measurements of the SAME compiled stage-1 NeRF step at the fern
operating point (504x378x17, fern_epi verbatim, N_rand=4096), one
process, readback-synced:

  dispatch : K independent dispatches, one final readback. The device
             must execute every step; wall/K minus the null floor is the
             true per-step device cost (matches the xplane while-body).
  scan_unchained : bench_train.py's historical protocol — scan of a step
             whose state/batch are closure CONSTANTS, carry only folds
             the scalar loss. XLA is free to hoist the invariant step
             out of the loop; if this number is far below `dispatch`,
             the historical 8.4 ms/step figure is a timing artifact.
  scan_chained : scan whose carry IS the optimizer state (true
             sequential dependence, the soak's real shape).

Also prints the step executable's cost_analysis flops -> achieved
TFLOP/s at the `dispatch` rate, to show the step is compute-floor-bound.

Usage: python scripts/probe_step_timing.py [WxHxV] [K]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SPEC = sys.argv[1] if len(sys.argv) > 1 else "504x378x17"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.cli import DEFAULT_STAGE1_CONFIG, enable_compilation_cache
    from pronerf_tpu.config import Config
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render.raygen import build_ray_pool, prepare_scene
    from pronerf_tpu.train.stage1 import (
        build_stage1_step_fns,
        init_stage1_state,
    )
    from pronerf_tpu.utils.profiling import readback
    from pronerf_tpu.utils.synthetic import (
        make_consistent_scene,
        parse_synthetic_spec,
    )

    enable_compilation_cache()
    cfg = Config.from_file(DEFAULT_STAGE1_CONFIG, datadir=f"synthetic:{SPEC}")
    sc = make_consistent_scene(seed=0, **parse_synthetic_spec(cfg.datadir))
    H, W, focal = sc["hwf"]
    i_train = list(range(1, len(sc["images"])))
    scene = prepare_scene(sc["images"][i_train], sc["poses"][i_train], sc["K"])
    rng = np.random.default_rng(0)
    pool, ids = build_ray_pool(
        sc["images"], sc["poses"], sc["K"], i_train, cfg.num_neighbor, rng
    )
    batch = jnp.asarray(pool[:cfg.N_rand])
    bids = jnp.asarray(ids[:cfg.N_rand])
    controls = {
        "rng": jax.random.PRNGKey(1),
        "n_mult": jnp.int32(4),
        "dir_expand": jnp.asarray(True),
        "dir_jitter": jnp.asarray(False),
        "neighbor_subset": jnp.arange(cfg.num_neighbor, dtype=jnp.int32),
        "target_t": jnp.zeros((3,), jnp.float32),
    }
    params = init_pronerf_params(jax.random.PRNGKey(0))
    state = init_stage1_state(params, cfg.weight_decay)
    nerf_fn, _ = build_stage1_step_fns(cfg, H, W, focal)
    jfn = jax.jit(nerf_fn)

    # null-dispatch floor
    f0 = jax.jit(lambda x: x + 1.0)
    readback(f0(jnp.zeros(())))
    nulls = []
    for _ in range(5):
        t0 = time.perf_counter()
        readback(f0(jnp.zeros(())))
        nulls.append((time.perf_counter() - t0) * 1e3)
    null = float(np.median(nulls))
    print(json.dumps({"null_ms": round(null, 2), "spec": SPEC, "K": K}),
          flush=True)

    state1, m = jfn(state, scene, batch, bids, controls, 5e-4)
    readback(m["loss"])
    flops = None
    try:
        ca = jfn.lower(state, scene, batch, bids, controls, 5e-4)\
                .compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception as e:  # cost_analysis is best-effort on this backend
        print(json.dumps({"cost_analysis_error": str(e)[:120]}), flush=True)

    # 1) K independent dispatches, single readback at the end
    def run_dispatch():
        outs = []
        t0 = time.perf_counter()
        for _ in range(K):
            _, m2 = jfn(state, scene, batch, bids, controls, 5e-4)
            outs.append(m2["loss"])
        readback(jnp.stack(outs).sum())
        return (time.perf_counter() - t0) * 1e3

    run_dispatch()  # warm the stack/readback path
    walls = [run_dispatch() for _ in range(3)]
    per_step = (float(np.median(walls)) - null) / K
    row = {"variant": "dispatch", "ms_per_step": round(per_step, 3)}
    if flops:
        row["step_gflop"] = round(flops / 1e9, 1)
        row["achieved_tflops"] = round(flops / (per_step * 1e-3) / 1e12, 1)
    print(json.dumps(row), flush=True)

    # 2) bench_train's historical protocol: unchained scan, scalar carry
    @jax.jit
    def loop_unchained(c):
        def body(c, _):
            _, m2 = jfn(state, scene, batch, bids, controls, 5e-4)
            return c + m2["loss"] * 1e-9, ()
        c, _ = jax.lax.scan(body, c, None, length=K)
        return c

    readback(loop_unchained(jnp.float32(0)))
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        readback(loop_unchained(jnp.float32(0)))
        walls.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({
        "variant": "scan_unchained",
        "ms_per_step": round((float(np.median(walls)) - null) / K, 3),
    }), flush=True)

    # 3) chained scan: carry is the optimizer state (true soak shape)
    @jax.jit
    def loop_chained(st):
        def body(st, _):
            st, m2 = nerf_fn(st, scene, batch, bids, controls, 5e-4)
            return st, m2["loss"]
        st, losses = jax.lax.scan(body, st, None, length=K)
        return losses.sum()

    readback(loop_chained(state))
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        readback(loop_chained(state))
        walls.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({
        "variant": "scan_chained",
        "ms_per_step": round((float(np.median(walls)) - null) / K, 3),
    }), flush=True)
    print("EXIT:0", flush=True)


if __name__ == "__main__":
    main()
