"""Learning-rate schedules.

- ``warmup_cosine``: the custom finetune schedule (reference:
  train_joint.py:210-218 lr_lambda — linear warmup then cosine to
  min_lr/base_lr floor).
- ``warmup_lr``: the vendored WarmupLR used by cosyvoice/bin/train.py
  (reference: cosyvoice/utils/scheduler.py:27-73 — Noam-style
  lr * warmup^0.5 * min(step^-0.5, step*warmup^-1.5)).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cosine(base_lr: float, min_lr: float, warmup_steps: int, total_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps)
        progress = (step - warmup_steps) / max(1, total_steps - warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(progress * 3.14159))  # truncated pi per reference
        cos = jnp.maximum(min_lr / base_lr, cos)
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_lr(base_lr: float, warmup_steps: int = 25000):
    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return base_lr * warmup_steps**0.5 * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)

    return schedule


def constant_lr(base_lr: float):
    return optax.constant_schedule(base_lr)
