"""LR schedules.

reference: utils.py:40-65 CosineLRWarmUp — linear warmup for `warmup_epochs`,
then half-cosine decay to `min_lr`; the CAT trainer steps it fractionally per
step: scheduler.step(epoch + step/steps_per_epoch) (cat_scripts/
train_cat.py:78). Expressed here as a pure function of the fractional epoch,
plus an optax-compatible by-step schedule.
"""

from __future__ import annotations

import math


def cosine_warmup_lr(fractional_epoch: float, *, warmup_epochs: float,
                     epochs: float, lr: float, min_lr: float = 0.0,
                     enabled: bool = True) -> float:
    if not enabled:
        return lr
    if fractional_epoch < warmup_epochs:
        return lr * fractional_epoch / warmup_epochs
    angle = math.pi * (fractional_epoch - warmup_epochs) / (epochs - warmup_epochs)
    return min_lr + (lr - min_lr) * 0.5 * (1.0 + math.cos(angle))


def make_step_schedule(steps_per_epoch: int, *, warmup_epochs: float,
                       epochs: float, lr: float, min_lr: float = 0.0,
                       enabled: bool = True):
    """optax schedule: step count -> lr, replicating the fractional stepping."""

    def sched(step):
        import jax.numpy as jnp
        frac_epoch = step / steps_per_epoch
        if not enabled:
            return jnp.float32(lr)
        warm = lr * frac_epoch / max(warmup_epochs, 1e-8)
        angle = jnp.pi * (frac_epoch - warmup_epochs) / (epochs - warmup_epochs)
        cos_lr = min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(angle))
        return jnp.where(frac_epoch < warmup_epochs, warm, cos_lr).astype(jnp.float32)

    return sched
