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
    """Reference scheduler.py:27-73 — ``step_num = last_epoch + 1``, so a
    0-based optax step maps to ``s = step + 1``."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0
        if warmup_steps == 0:
            return base_lr * s**-0.5
        return base_lr * warmup_steps**0.5 * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)

    return schedule


def constant_lr(base_lr: float):
    return optax.constant_schedule(base_lr)


def _warmup_policy(base_lr: float, warmup_steps: int, max_steps: int,
                   min_lr: float, anneal):
    """NeMo WarmupPolicy.get_lr semantics (scheduler.py:110-131):
    ``step <= warmup`` -> base*(step+1)/(warmup+1); ``step > max_steps`` ->
    min_lr; else the annealing function."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr * (s + 1.0) / (warmup_steps + 1.0)
        out = jnp.where(s > max_steps, min_lr, anneal(s))
        if warmup_steps > 0:
            out = jnp.where(s <= warmup_steps, warm, out)
        return out

    return schedule


def square_annealing(base_lr: float, warmup_steps: int, max_steps: int, min_lr: float = 0.0):
    """scheduler.py:384-388, 459-467 / SquareAnnealing — the anneal runs on
    (step - warmup) over (max_steps - warmup), so the curve starts at
    base_lr exactly when warmup ends (no cliff)."""
    span = max(max_steps - warmup_steps, 1)
    return _warmup_policy(base_lr, warmup_steps, max_steps, min_lr, lambda s: jnp.maximum(
        base_lr * jnp.square((span - (s - warmup_steps)) / span), min_lr))


def squareroot_annealing(base_lr: float, warmup_steps: int, max_steps: int, min_lr: float = 0.0):
    """scheduler.py:377-381 / SquareRootAnnealing."""
    return _warmup_policy(base_lr, warmup_steps, max_steps, min_lr, lambda s: jnp.maximum(
        base_lr * jnp.sqrt(jnp.maximum((max_steps - s) / max_steps, 0.0)), min_lr))


def cosine_annealing(base_lr: float, warmup_steps: int, max_steps: int, min_lr: float = 0.0):
    """scheduler.py:391-394, 512-527 / CosineAnnealing — like SquareAnnealing
    the anneal phase is offset by warmup_steps (SquareRootAnnealing is NOT,
    per the reference, scheduler.py:486-492)."""
    span = max(max_steps - warmup_steps, 1)
    return _warmup_policy(base_lr, warmup_steps, max_steps, min_lr, lambda s: (
        base_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * (s - warmup_steps) / span)) + min_lr)


def noam_annealing(base_lr: float, d_model: int, warmup_steps: int, min_lr: float = 0.0):
    """scheduler.py:558-619 / NoamAnnealing — ``step = max(1, last_epoch)``."""
    normalize = d_model ** -0.5

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        if warmup_steps > 0:
            mult = normalize * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        else:
            mult = normalize * s ** -0.5
        lr = base_lr * mult
        return jnp.where(s > warmup_steps, jnp.maximum(lr, min_lr), lr)

    return schedule


def noam_hold_annealing(base_lr: float, warmup_steps: int, hold_steps: int,
                        max_steps: int, decay_rate: float = 0.5, min_lr: float = 0.0):
    """scheduler.py:433-441, 623-718 / NoamHoldAnnealing (WarmupHoldPolicy):
    linear warmup -> hold at peak until ``warmup+hold`` -> polynomial decay
    ``base * warmup^dr / (step - hold)^dr``.  ``hold_steps`` is the hold
    duration (the reference's constructor arg), not the absolute boundary."""
    hold_end = hold_steps + warmup_steps  # WarmupHoldPolicy.__init__:241-247

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr * (s + 1.0) / (warmup_steps + 1.0)
        t_warm = max(1.0, warmup_steps ** decay_rate)
        t_hold = jnp.maximum(1.0, jnp.sign(s - hold_steps) *
                             jnp.abs(s - hold_steps) ** decay_rate)
        decayed = jnp.maximum(base_lr * t_warm / t_hold, min_lr)
        out = jnp.where(s > max_steps, min_lr, decayed)
        out = jnp.where((s >= warmup_steps) & (s < hold_end), base_lr, out)
        if warmup_steps > 0:
            out = jnp.where(s <= warmup_steps, warm, out)
        return out

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


def make_schedule(train_cfg, total_steps: int):
    """Build the schedule selected by ``TrainConfig.scheduler`` (the
    reference selects by name in cosyvoice/utils/train_utils.py:144-170)."""
    name = train_cfg.scheduler.lower()
    lr, min_lr, warm = (train_cfg.learning_rate, train_cfg.min_learning_rate,
                        train_cfg.warmup_steps)
    if name == "warmup_cosine":
        return warmup_cosine(lr, min_lr, warm, total_steps)
    if name == "warmuplr":
        return warmup_lr(lr, warm)
    if name == "constantlr":
        return constant_lr(lr)
    if name == "cosine_annealing":
        return cosine_annealing(lr, warm, total_steps, min_lr)
    if name == "square_annealing":
        return square_annealing(lr, warm, total_steps, min_lr)
    if name == "squareroot_annealing":
        return squareroot_annealing(lr, warm, total_steps, min_lr)
    if name == "noam_annealing":
        return noam_annealing(lr, train_cfg.scheduler_d_model, warm, min_lr)
    if name == "noamhold_annealing":
        return noam_hold_annealing(lr, warm, train_cfg.scheduler_hold_steps,
                                   total_steps, train_cfg.scheduler_decay_rate,
                                   min_lr)
    raise ValueError(f"unknown scheduler {train_cfg.scheduler!r}; "
                     f"one of {sorted(SCHEDULES)}")
