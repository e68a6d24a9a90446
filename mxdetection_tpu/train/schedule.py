"""LR schedule: linear warmup + multi-step decay.

Reference equivalent: ``WarmupMultiFactorScheduler`` (``*/utils/
lr_scheduler.py``; SURVEY.md §2.2): linear warmup over ~500 iters from
``base_lr * warmup_ratio``, then x0.1 at epochs [8, 11] for the 1x schedule.
Expressed as a pure step -> lr function (optax-compatible).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_multistep(
    base_lr: float,
    *,
    warmup_steps: int,
    warmup_ratio: float,
    decay_steps: tuple,
    decay_factor: float,
):
    """Returns f(step) -> lr."""

    decay_steps = tuple(int(s) for s in decay_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_frac = jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0)
        warm_lr = base_lr * (warmup_ratio + (1.0 - warmup_ratio) * warm_frac)
        num_decays = jnp.sum(
            jnp.asarray([step >= s for s in decay_steps], jnp.float32)
        ) if decay_steps else 0.0
        lr = warm_lr * (decay_factor ** num_decays)
        return lr

    return schedule
