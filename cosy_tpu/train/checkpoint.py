"""Sharded async checkpointing for the full-parameter trainers (orbax).

Reference behavior: the vendored trainer saves rank-0 ``.pt`` snapshots with
an epoch/step yaml sidecar and resumes from them restoring step position
(cosyvoice/utils/train_utils.py:195-214; cosyvoice/bin/train.py:135-153;
DeepSpeed engines use ``save_checkpoint``).

TPU-native re-design: an orbax ``CheckpointManager``.  Each host writes its
own shards of the dp/ZeRO-2/TP-sharded param and optimizer trees (no gather
to rank 0 — the reference's rank-0 ``.pt`` funnel serializes the whole model
through one process), saves run ASYNC so the step loop keeps enqueueing
while the filesystem write drains (the device->host copy completes before
``save`` returns, so buffer donation in the next step is safe), retention
keeps the newest K steps, and restore places every leaf directly onto its
target sharding.

The LoRA fine-tune trainer keeps its tiny-footprint ``.npz`` snapshots
(train/trainer.py — adapters are ~12k params); this module serves the
full-parameter regimes where checkpoint volume and multi-host layout matter.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["TrainCheckpointer", "save_model_pt", "load_model_pt"]


class TrainCheckpointer:
    """Thin orbax CheckpointManager wrapper over a pytree of jax.Arrays."""

    def __init__(self, directory: str, keep: int = 3, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, enable_async_checkpointing=async_save),
        )

    def save(self, step: int, tree) -> None:
        """Enqueue a save of ``tree`` at ``step`` (async: returns after the
        device->host copy; the write itself overlaps subsequent steps)."""
        self.mgr.save(step, args=self._ocp.args.StandardSave(tree))

    def restore(self, tree_like, step: Optional[int] = None):
        """Restore the checkpoint at ``step`` (default: latest) shaped and
        SHARDED like ``tree_like`` — every leaf lands on the target mesh
        layout directly, no replicate-then-reshard."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")

        def as_abstract(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            return x

        abstract = jax.tree.map(as_abstract, tree_like)
        return self.mgr.restore(step, args=self._ocp.args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def all_steps(self):
        return sorted(self.mgr.all_steps())

    def wait(self) -> None:
        """Block until pending async saves are durable."""
        self.mgr.wait_until_finished()

    def close(self) -> None:
        self.mgr.close()


def save_model_pt(params, path: str, info: Optional[dict] = None) -> Optional[str]:
    """Reference-format model export: a torch ``.pt`` state dict plus a yaml
    info sidecar, written by process 0 only (train_utils.py:195-214).

    Returns the path written, or None on non-zero processes."""
    if jax.process_index() != 0:
        return None
    from ..params import save_torch_checkpoint

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_torch_checkpoint(params, path)
    if info is not None:
        with open(os.path.splitext(path)[0] + ".yaml", "w") as f:
            for k, v in sorted(info.items()):
                f.write(f"{k}: {v}\n")
    return path


def load_model_pt(path: str):
    from ..params import load_torch_checkpoint

    return load_torch_checkpoint(path)
