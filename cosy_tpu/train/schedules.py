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


def _with_warmup(base_lr: float, warmup_steps: int, anneal):
    """Linear warmup to base_lr, then the annealing function (NeMo
    WarmupPolicy semantics, scheduler.py:76-…)."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr * s / max(1, warmup_steps)
        return jnp.where(s <= warmup_steps, warm, anneal(s))

    return schedule


def square_annealing(base_lr: float, warmup_steps: int, max_steps: int, min_lr: float = 0.0):
    """scheduler.py:384-388 / SquareAnnealing."""
    return _with_warmup(base_lr, warmup_steps, lambda s: jnp.maximum(
        base_lr * jnp.square((max_steps - s) / max_steps), min_lr))


def squareroot_annealing(base_lr: float, warmup_steps: int, max_steps: int, min_lr: float = 0.0):
    """scheduler.py:377-381 / SquareRootAnnealing."""
    return _with_warmup(base_lr, warmup_steps, lambda s: jnp.maximum(
        base_lr * jnp.sqrt(jnp.maximum((max_steps - s) / max_steps, 0.0)), min_lr))


def cosine_annealing(base_lr: float, warmup_steps: int, max_steps: int, min_lr: float = 0.0):
    """scheduler.py:391-394 / CosineAnnealing."""
    return _with_warmup(base_lr, warmup_steps, lambda s: (base_lr - min_lr) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * jnp.minimum(s, max_steps) / max_steps)) + min_lr)


def noam_annealing(base_lr: float, d_model: int, warmup_steps: int, min_lr: float = 0.0):
    """scheduler.py:558-619 / NoamAnnealing."""
    normalize = d_model ** -0.5

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        mult = normalize * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        lr = base_lr * mult
        return jnp.where(s > warmup_steps, jnp.maximum(lr, min_lr), lr)

    return schedule


def noam_hold_annealing(base_lr: float, warmup_steps: int, hold_steps: int,
                        decay_rate: float = 0.5, min_lr: float = 0.0):
    """scheduler.py:433-441 / NoamHoldAnnealing: warmup -> hold at peak ->
    polynomial decay."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr * s / max(1, warmup_steps)
        t_warm = max(1.0, warmup_steps ** decay_rate)
        t_hold = jnp.maximum(1.0, jnp.maximum(s - hold_steps, 1.0) ** decay_rate)
        decayed = jnp.maximum(base_lr * t_warm / t_hold, min_lr)
        return jnp.where(s <= warmup_steps, warm,
                         jnp.where(s <= hold_steps, base_lr, decayed))

    return schedule


SCHEDULES = {
    "warmuplr": warmup_lr,
    "warmup_cosine": warmup_cosine,
    "constantlr": constant_lr,
    "cosine_annealing": cosine_annealing,
    "square_annealing": square_annealing,
    "squareroot_annealing": squareroot_annealing,
    "noam_annealing": noam_annealing,
    "noamhold_annealing": noam_hold_annealing,
}
