"""Multi-host coordination utilities.

The reference escapes uneven per-rank data with a gloo side-channel
``monitored_barrier`` (``cosyvoice_join``, train_utils.py:217-235) and DDP
``model.join``.  The TPU-native equivalent: every step-boundary decision
("do we all have another batch?") is a cross-process all-gather + min, so
all hosts take the same branch and no collective is ever entered by a
strict subset (which would hang XLA).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np


def all_hosts_agree(flag: bool) -> bool:
    """True only if every JAX process passes True.

    Uses the standard cross-process allgather (a no-op reduction on a
    single-host run); call at step boundaries only — it synchronizes."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        jnp.asarray([1 if flag else 0], jnp.int32))
    return bool(np.min(np.asarray(flags)))


def joined_loader(loader: Iterable) -> Iterator:
    """Yield batches while EVERY host still has one; stop synchronously the
    moment any host is exhausted (the DDP ``model.join`` uneven-workload
    escape, executor.py:51-52 + train_utils.py:217-235).

    Single-host this is a transparent peek-ahead wrapper; multi-host the
    agreement all-gather makes every host end the epoch on the same step,
    so the per-step psum collectives always see all participants.
    """
    it = iter(loader)
    while True:
        try:
            batch = next(it)
            have = True
        except StopIteration:
            batch = None
            have = False
        if not all_hosts_agree(have):
            return
        yield batch
