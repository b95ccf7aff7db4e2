"""Device mesh + sharding layout.

The reference scales via torch DDP/NCCL allreduce (cosyvoice/utils/
train_utils.py:94-108); the TPU-native equivalent is a 1-D ``dp`` mesh with
batch-sharded inputs and replicated params — XLA inserts the LoRA-gradient
psum over ICI automatically when the jitted loss reduces over the sharded
batch axis.  A ``model`` axis is reserved for future tensor parallelism
(parity does not require TP; SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec


def make_mesh(
    dp: Optional[int] = None,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(dp, seq, model) mesh.  ``seq`` carries sequence parallelism
    (parallel/sp.py activation sharding over the time axis); size-1 axes
    cost nothing, so every mesh exposes all three names."""
    devices = list(devices if devices is not None else jax.devices())
    dp = dp if dp is not None else len(devices) // (model * seq)
    n = dp * seq * model
    assert n <= len(devices), (dp, seq, model, len(devices))
    arr = np.asarray(devices[:n]).reshape(dp, seq, model)
    return Mesh(arr, ("dp", "seq", "model"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the given axis over dp, replicate the rest."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "dp"
    return NamedSharding(mesh, PSpec(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PSpec())


def shard_batch(mesh: Mesh, batch: dict, batch_axis: int = 0) -> dict:
    """Device-put a host batch with the batch axis sharded over dp.

    For super-batches shaped (accum, B, ...) the sharded axis is 1 (the
    per-step batch), so every accumulation micro-step is data-parallel.
    """
    sh = batch_sharding(mesh, batch_axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
