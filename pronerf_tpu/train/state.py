"""Optimizers and LR schedules.

The reference runs torch Adam(betas=(0.9, 0.999), eps=1e-8) with optional
per-group L2 weight decay and an exponential LR decay applied MANUALLY every
step (``run_S_eS_eN_alter_base.py:960-967``). Stage 1 decays on
``global_step / 2`` (both optimizers step every other iteration); stage 2
decays on ``global_step`` without the halving
(``run_S_eS_eN_alter_base_refine2.py:871-878``).

We keep the learning rate OUT of the optax transform (scale_by_adam only)
and fold it in at the update application, so the LR is a traced scalar and
one compiled step serves the whole schedule.
"""

from __future__ import annotations

import jax
import optax


def make_tx(weight_decay: float = 0.0):
    """Adam moments (+ optional decoupled-into-gradient L2, torch-style)."""
    if weight_decay and weight_decay > 0.0:
        return optax.chain(
            optax.add_decayed_weights(weight_decay), optax.scale_by_adam()
        )
    return optax.scale_by_adam()


def apply_updates(params, updates, lr):
    """params <- params - lr * adam_update (lr is a traced scalar)."""
    return jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)


def stage1_lr(global_step, lrate: float, lrate_decay: int):
    """lrate * 0.1 ** ((global_step / 2) / (lrate_decay * 1000))."""
    return lrate * 0.1 ** ((global_step / 2.0) / (lrate_decay * 1000.0))


def stage2_lr(global_step, lrate: float, lrate_decay: int):
    """lrate * 0.1 ** (global_step / (lrate_decay * 1000))."""
    return lrate * 0.1 ** (global_step / (lrate_decay * 1000.0))
