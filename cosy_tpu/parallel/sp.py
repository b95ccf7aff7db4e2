"""Sequence parallelism: activation sharding over the time axis.

The reference has no sequence parallelism (its only scale-out is DDP,
SURVEY.md §2.5).  TPU-native formulation: the mesh reserves a ``seq`` axis
(parallel/mesh.py) and the flow training forward drops
``with_sharding_constraint`` annotations on its (.., T, ..) activations —
XLA's SPMD partitioner shards the pointwise/conv work over the time axis and
inserts the all-gathers the attention blocks need, so the math is identical
to the replicated run (a layout annotation, not a numerics change).

Models never take a mesh argument: trainers enter :func:`sequence_sharding`
around the jitted loss, and :func:`shard_seq` becomes a no-op outside it (or
when the mesh's ``seq`` axis is 1), so single-device paths are untouched.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

_state = threading.local()


def _current_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextmanager
def sequence_sharding(mesh: Optional[Mesh]):
    """Activate seq-axis activation sharding for loss forwards traced within."""
    prev = getattr(_state, "mesh", None)
    _state.mesh = mesh
    try:
        yield
    finally:
        _state.mesh = prev


def seq_axis_size(mesh: Optional[Mesh] = None) -> int:
    mesh = mesh or _current_mesh()
    if mesh is None:
        return 1
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("seq", 1)


def shard_seq(x: jax.Array, time_axis: int) -> jax.Array:
    """Constrain ``x`` to shard its ``time_axis`` over the mesh ``seq`` axis.

    No-op when no sequence-sharding context is active, the mesh has seq==1,
    or the time dimension does not divide evenly (GSPMD would still accept
    uneven shards, but even division keeps layouts predictable)."""
    mesh = _current_mesh()
    if mesh is None or seq_axis_size(mesh) <= 1:
        return x
    size = seq_axis_size(mesh)
    if x.ndim <= time_axis or x.shape[time_axis] % size != 0:
        return x
    spec = [None] * x.ndim
    spec[time_axis] = "seq"
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, PSpec(*spec)))
