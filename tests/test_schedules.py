"""Formula-level LR schedule parity vs the reference torch schedulers.

Expected values are hand-evaluated from the reference formulas
(cosyvoice/utils/scheduler.py): WarmupLR :27-73, NeMo WarmupPolicy.get_lr
:110-131, WarmupHoldPolicy.get_lr :257-280, _square/_squareroot/_cosine
annealing :377-394, NoamAnnealing :558-619, _noam_hold_annealing :433-441.
The torch side steps via ``last_epoch`` = the 0-based step we pass in.
"""

import math

import numpy as np
import pytest

from cosy_tpu.config import TrainConfig, replace
from cosy_tpu.train import schedules as S

LR, MIN_LR, WARM, MAX = 1e-3, 1e-5, 10, 100
STEPS = [0, 1, 5, 10, 11, 42, 99, 100, 150]


def torch_warmup_lr(step):
    s = step + 1
    return LR * WARM**0.5 * min(s**-0.5, s * WARM**-1.5)


def warmup_policy(step, anneal):
    if step <= WARM and WARM > 0:
        return LR * (step + 1) / (WARM + 1)
    if step > MAX:
        return MIN_LR
    return anneal(step)


def torch_square(step):
    # SquareAnnealing._get_lr (scheduler.py:459-467) anneals on
    # (step - warmup) over (max - warmup)
    span = MAX - WARM
    return warmup_policy(step, lambda s: max(
        LR * ((span - (s - WARM)) / span) ** 2, MIN_LR))


def torch_squareroot(step):
    # SquareRootAnnealing._get_lr (scheduler.py:486-492) uses the RAW step
    return warmup_policy(step, lambda s: max(LR * ((MAX - s) / MAX) ** 0.5, MIN_LR))


def torch_cosine(step):
    # CosineAnnealing._get_lr (scheduler.py:512-527): warmup-offset anneal
    span = MAX - WARM
    return warmup_policy(
        step, lambda s: (LR - MIN_LR) * 0.5
        * (1 + math.cos(math.pi * (s - WARM) / span)) + MIN_LR)


def torch_noam(step, d_model=64):
    s = max(1, step)
    mult = d_model**-0.5 * min(s**-0.5, s * WARM**-1.5)
    lr = LR * mult
    return max(lr, MIN_LR) if s > WARM else lr


def torch_noam_hold(step, hold=30, decay_rate=0.5):
    # WarmupHoldPolicy: hold attr = hold + warmup; _get_lr passes the raw
    # hold duration into _noam_hold_annealing.
    if step <= WARM and WARM > 0:
        return LR * (step + 1) / (WARM + 1)
    if WARM <= step < hold + WARM:
        return LR
    if step > MAX:
        return MIN_LR
    t_warm = max(1, WARM**decay_rate)
    t_hold = max(1, (step - hold) ** decay_rate)
    return max(LR * t_warm / t_hold, MIN_LR)


@pytest.mark.parametrize("name,ours,ref", [
    ("warmuplr", lambda: S.warmup_lr(LR, WARM), torch_warmup_lr),
    ("square", lambda: S.square_annealing(LR, WARM, MAX, MIN_LR), torch_square),
    ("squareroot", lambda: S.squareroot_annealing(LR, WARM, MAX, MIN_LR), torch_squareroot),
    ("cosine", lambda: S.cosine_annealing(LR, WARM, MAX, MIN_LR), torch_cosine),
    ("noam", lambda: S.noam_annealing(LR, 64, WARM, MIN_LR), torch_noam),
    ("noamhold", lambda: S.noam_hold_annealing(LR, WARM, 30, MAX, 0.5, MIN_LR),
     torch_noam_hold),
])
def test_schedule_matches_torch_reference(name, ours, ref):
    sched = ours()
    for step in STEPS:
        got = float(sched(step))
        want = ref(step)
        assert got == pytest.approx(want, rel=1e-5), (name, step, got, want)


def test_make_schedule_selects_all():
    for name in S.SCHEDULES:
        cfg = replace(TrainConfig(), scheduler=name, scheduler_hold_steps=30,
                      scheduler_d_model=64)
        sched = S.make_schedule(cfg, total_steps=100)
        vals = np.asarray([float(sched(s)) for s in [0, 10, 50]])
        assert np.all(np.isfinite(vals)) and np.all(vals >= 0)


def test_make_schedule_rejects_unknown():
    with pytest.raises(ValueError):
        S.make_schedule(replace(TrainConfig(), scheduler="nope"), 10)


def test_annealing_continuous_at_warmup_end():
    """The offset anneals must START at ~base_lr when warmup ends — the
    un-offset formula produced a 35-44% LR cliff at step WARM+1."""
    for make in (lambda: S.square_annealing(LR, WARM, MAX, MIN_LR),
                 lambda: S.cosine_annealing(LR, WARM, MAX, MIN_LR)):
        sched = make()
        assert float(sched(WARM + 1)) > 0.97 * LR
