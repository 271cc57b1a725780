"""Device-resident training executor: K train steps per dispatch.

The straightforward loop dispatches one compiled step per iteration and
ships a handful of control scalars (n_mult, direction coins, neighbor
subset) from host each time. On real hardware that's fine; through a
high-latency link (or at very small step times — stage-2 runs 2.3 ms) the
dispatch overhead dominates. This executor:

- keeps the WHOLE ray pool on device and slices batches in-graph;
- derives all per-step randomness in-graph from a folded PRNG key
  (distributionally identical to the reference's host draws: n_mult ~
  U{1..8}, direction coins ~ Bernoulli(0.5), neighbor subset = sorted
  4-choice without replacement — ``run_S_eS_eN_alter_base.py:689-729``);
- runs K steps inside one ``lax.scan``, alternating the stage-1 branches
  with ``lax.cond`` on step parity (both branches live in one executable);
- returns mean/last metrics for the chunk.

Enabled with ``Config.scan_steps > 1``; the reference-shaped per-step loop
remains the default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pronerf_tpu.train.state import stage1_lr, stage2_lr


def _draw_device_controls(key, step, n_train: int, num_neighbor: int,
                          max_mult: int):
    k = jax.random.fold_in(key, step)
    k1, k2, k3, k4, k5 = jax.random.split(k, 5)
    subset = jnp.sort(
        jax.random.choice(k4, n_train - 1, (num_neighbor,), replace=False)
    ).astype(jnp.int32)
    return {
        "rng": k5,
        "n_mult": jax.random.randint(k1, (), 1, max_mult + 1, jnp.int32),
        "dir_expand": jax.random.bernoulli(k2),
        "dir_jitter": jax.random.bernoulli(k3),
        "neighbor_subset": subset,
        "target_t": jnp.zeros((3,), jnp.float32),
    }


def make_scan_executor(cfg, H: int, W: int, focal: float, n_train: int,
                       stage: int, scan_steps: int):
    """Build a jitted (state, pool, pool_ids, i_batch0, base_key) ->
    (state, metrics) executor running ``scan_steps`` consecutive steps.

    The caller guarantees i_batch0 + scan_steps * N_rand <= len(pool)
    (reshuffle between chunks, same as the per-step loop).
    """
    from pronerf_tpu.train.stage1 import build_stage1_step_fns
    from pronerf_tpu.train.stage2 import build_stage2_step_fn

    max_mult = max(1, 64 // cfg.N_samples)
    n_rand = cfg.N_rand

    if stage == 1:
        nerf_fn, sampler_fn = build_stage1_step_fns(cfg, H, W, focal)
        lr_fn = lambda s: stage1_lr(s, cfg.lrate, cfg.lrate_decay)
    else:
        joint_fn = build_stage2_step_fn(cfg, H, W, focal)
        lr_fn = lambda s: stage2_lr(s, cfg.lrate, cfg.lrate_decay)

    @partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, scene, pool, pool_ids, i_batch0, base_key):
        def body(carry, k):
            state, _ = carry
            # iteration number i (1-based like the reference loop)
            i = state["global_step"] + 1
            batch = jax.lax.dynamic_slice_in_dim(
                pool, i_batch0 + k * n_rand, n_rand
            )
            bids = jax.lax.dynamic_slice_in_dim(
                pool_ids, i_batch0 + k * n_rand, n_rand
            )
            controls = _draw_device_controls(
                base_key, i, n_train, cfg.num_neighbor, max_mult
            )
            lr = lr_fn((i - 1).astype(jnp.float32))
            if stage == 1:
                state, metrics = jax.lax.cond(
                    i % 2 != 0,
                    lambda s: nerf_fn(s, scene, batch, bids, controls, lr),
                    lambda s: sampler_fn(s, scene, batch, bids, controls, lr),
                    state,
                )
            else:
                state, metrics = joint_fn(
                    state, scene, batch, bids, controls, lr
                )
            return (state, metrics), (metrics["loss"], metrics["psnr"])

        (state, last_metrics), (losses, psnrs) = jax.lax.scan(
            body, (state, {"loss": jnp.float32(0), "psnr": jnp.float32(0)}),
            jnp.arange(scan_steps),
        )
        last_metrics = dict(
            last_metrics,
            mean_loss=jnp.mean(losses),
            mean_psnr=jnp.mean(psnrs),
        )
        return state, last_metrics

    def executor(state, scene, pool, pool_ids, i_batch0, base_key):
        return run_chunk(state, scene, pool, pool_ids,
                         jnp.int32(i_batch0), base_key)

    return executor
