"""A/B the ``train_precision=bf16`` opt-in on the attached TPU.

Why: the round-5 profile attribution (after fixing the xplane
control-flow double count) shows the fern-scale train step is ~22 ms
device time, ~90% in MLP fusions whose cost is the HBM streaming of f32
activations ([4096*64, 256] = 268 MB per NeRF layer per pass), not MXU
FLOPs. bf16 operands halve that stream; params/grads/optimizer/loss stay
f32 (bf16 only inside the nets, f32 MXU accumulation —
``models/mlp.py:linear``). CPU equality is tested in
tests/test_train_smoke.py::test_train_precision_bf16_matches_f32_closely.

Two measurements, one JSON row each, appended to
results/probes_r5_bf16_train.txt:

  timing   bench_train's CHAINED-scan protocol (the honest one: the
           carry is the optimizer state) for the three compiled steps,
           f32 vs bf16, at the fern operating point.
  quality  a short matched-seed stage-1 leg (--steps, default 3000)
           through the scan executor per arm; reports the final
           chunk-mean train PSNR. A screening signal only — NOT a
           trained-quality claim (that would need a full-schedule A/B).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT_DEFAULT = REPO / "results/probes_r5_bf16_train.txt"


def emit(out_path, obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(out_path, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", default=str(OUT_DEFAULT))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pronerf_tpu.cli import enable_compilation_cache
    from pronerf_tpu.config import Config
    from pronerf_tpu.models import init_pronerf_params
    from pronerf_tpu.render import prepare_scene
    from pronerf_tpu.render.raygen import build_ray_pool
    from pronerf_tpu.train.fast_loop import make_scan_executor
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

    enable_compilation_cache()

    f0 = jax.jit(lambda x: x + 1.0)
    readback(f0(jnp.zeros(())))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        readback(f0(jnp.zeros(())))
        times.append((time.perf_counter() - t0) * 1e3)
    null = float(np.median(times))

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
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    # -- timing (bench_train's chained protocol, per precision arm)
    for tp in ("f32", "bf16"):
        cfg = Config.from_file(
            "configs/llff/fern/fern_epi.txt", train_precision=tp
        )
        nerf_fn, sampler_fn = build_stage1_step_fns(cfg, H, W, 0.8 * W)
        s2_fn = build_stage2_step_fn(cfg.replace(lrate=3e-4), H, W, 0.8 * W)
        row = {"phase": "timing", "train_precision": tp, "null_ms":
               round(null, 2)}
        iters = 12
        for name, fn, state0 in [
            ("stage1_nerf_ms", nerf_fn, init_stage1_state(copy(params))),
            ("stage1_sampler_ms", sampler_fn,
             init_stage1_state(copy(params))),
            ("stage2_ms", s2_fn, init_stage2_state(copy(params))),
        ]:
            @jax.jit
            def loop(st, fn=fn):
                def body(st, _):
                    st, m2 = fn(st, scene, batch, bids, controls, 5e-4)
                    return st, m2["loss"]
                st, losses = jax.lax.scan(body, st, None, length=iters)
                return losses.sum()

            readback(loop(state0))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                readback(loop(state0))
                ts.append((time.perf_counter() - t0) * 1e3)
            row[name] = round((float(np.median(ts)) - null) / iters, 3)
        row["stage1_alternating_ms"] = round(
            (row["stage1_nerf_ms"] + row["stage1_sampler_ms"]) / 2, 3
        )
        emit(args.out, row)

    # -- quality screen (matched seeds, short stage-1 leg per arm)
    for tp in ("f32", "bf16"):
        cfg = Config.from_file(
            "configs/llff/fern/fern_epi.txt", train_precision=tp,
            scan_steps=50,
        )
        ex = make_scan_executor(cfg, H, W, 0.8 * W, 16, 1, 50)
        state = init_stage1_state(copy(params), cfg.weight_decay)
        pool_j, ids_j = jnp.asarray(pool), jnp.asarray(ids)
        t0 = time.time()
        psnr = None
        for chunk in range(args.steps // 50):
            state, m = ex(state, scene, pool_j, ids_j, 0,
                          jax.random.PRNGKey(chunk))
            psnr = float(readback(m["mean_psnr"]))
        emit(args.out, {
            "phase": "quality_screen", "train_precision": tp,
            "steps": args.steps, "final_chunk_mean_psnr": round(psnr, 3),
            "wall_s": round(time.time() - t0, 1),
            "note": "short-leg screening signal, not a trained-quality "
                    "claim",
        })


if __name__ == "__main__":
    main()
