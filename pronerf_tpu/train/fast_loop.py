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
- runs K steps inside one ``lax.scan``. Stage 1 scans over step PAIRS —
  each iteration runs one NeRF step then one sampler step sequentially
  (the alternation is deterministic, so no ``lax.cond`` is needed; the
  earlier cond-on-parity formulation risks XLA predicating BOTH branch
  bodies every step). Requires an even ``global_step`` at chunk start —
  the driver falls back to the per-step loop otherwise;
- returns mean/last metrics for the chunk.

Enabled with ``Config.scan_steps > 1``; the reference-shaped per-step loop
remains the default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pronerf_tpu.train.state import stage1_lr, stage2_lr


@partial(jax.jit, donate_argnums=(0, 1))
def device_reshuffle(pool, pool_ids, key):
    """Reshuffle the device-resident ray pool between scan chunks.

    The reference reshuffles on the host (np permutation of the whole pool)
    and the straightforward port re-uploads the result. At fern scale that
    ships ~129 MB (3.24 M rays x [3, 3] f32 + ids) through the host link
    every pool epoch — ~800 steps at N_rand=4096 — which through a
    tunneled/high-latency device dominates the marginal step cost. One
    device-side gather with a jax.random permutation is host-traffic-free
    and distributionally identical (uniform permutation, keyed per epoch).
    Buffers are donated: the pool is permuted without a second copy living
    on host or in HBM.
    """
    perm = jax.random.permutation(key, pool.shape[0])
    return jnp.take(pool, perm, axis=0), jnp.take(pool_ids, perm, axis=0)


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

    The caller reshuffles the pool between chunks (same as the per-step
    loop). When the pool holds fewer than ``scan_steps`` batches, the
    in-chunk batch index wraps modulo the pool's capacity (see
    ``_one_step``) — the driver prints a loud note in that case.
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

    def _one_step(step_fn, state, scene, pool, pool_ids, i_batch0, k,
                  base_key):
        # iteration number i (1-based like the reference loop)
        i = state["global_step"] + 1
        # Wrap the in-chunk batch index modulo the pool's batch capacity:
        # dynamic_slice CLAMPS out-of-range starts, so without the wrap a
        # chunk longer than the pool would silently retrain most steps on
        # the pool's final window (seen as stage-2 divergence on the 80x60
        # soak scene: 33.6k-ray pool vs 50*4096 stride). When the pool
        # holds the whole chunk (the fern-scale case) the wrap is a no-op
        # and slicing matches the reference's sequential epochs exactly.
        n_batches = max(pool.shape[0] // n_rand, 1)
        start = i_batch0 + (k % n_batches) * n_rand
        batch = jax.lax.dynamic_slice_in_dim(pool, start, n_rand)
        bids = jax.lax.dynamic_slice_in_dim(pool_ids, start, n_rand)
        controls = _draw_device_controls(
            base_key, i, n_train, cfg.num_neighbor, max_mult
        )
        lr = lr_fn((i - 1).astype(jnp.float32))
        return step_fn(state, scene, batch, bids, controls, lr)

    @partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, scene, pool, pool_ids, i_batch0, base_key):
        if stage == 1:
            # scan over PAIRS: odd step (NeRF) then even step (sampler),
            # sequentially — no cond, no risk of predicated double work.
            # Caller guarantees global_step is EVEN and scan_steps too.
            def body(carry, p):
                state, _ = carry
                state, m1 = _one_step(nerf_fn, state, scene, pool,
                                      pool_ids, i_batch0, 2 * p, base_key)
                state, m2 = _one_step(sampler_fn, state, scene, pool,
                                      pool_ids, i_batch0, 2 * p + 1,
                                      base_key)
                return (state, m2), (
                    jnp.stack([m1["loss"], m2["loss"]]),
                    jnp.stack([m1["psnr"], m2["psnr"]]),
                )

            (state, last_metrics), (losses, psnrs) = jax.lax.scan(
                body,
                (state, {"loss": jnp.float32(0), "psnr": jnp.float32(0)}),
                jnp.arange(scan_steps // 2),
            )
        else:
            def body(carry, k):
                state, _ = carry
                state, metrics = _one_step(joint_fn, state, scene, pool,
                                           pool_ids, i_batch0, k, base_key)
                return (state, metrics), (metrics["loss"], metrics["psnr"])

            (state, last_metrics), (losses, psnrs) = jax.lax.scan(
                body,
                (state, {"loss": jnp.float32(0), "psnr": jnp.float32(0)}),
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
