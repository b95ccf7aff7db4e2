"""TensorBoard scalar output (reference train_utils.py:187-192 writes TB
summaries on rank 0; this is the equivalent over the metrics stream).

The writer is import-gated: when the tensorboard package is missing it
degrades to a no-op and metrics.jsonl remains the source of truth.  Scalars
are flushed from already-fetched host values (epoch boundaries) — never
per-step device fetches, which would cost a tunnel round-trip each.
"""

from __future__ import annotations

import os
from typing import Dict, Optional


class TBWriter:
    """Rank-0 TensorBoard scalar writer with graceful no-op fallback."""

    def __init__(self, logdir: Optional[str], enabled: bool = True):
        self._w = None
        if not (enabled and logdir):
            return
        import jax

        if jax.process_index() != 0:  # rank-0 save discipline
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            os.makedirs(logdir, exist_ok=True)
            self._w = SummaryWriter(logdir)
        except Exception:  # noqa: BLE001 — tensorboard genuinely optional
            self._w = None

    @property
    def active(self) -> bool:
        return self._w is not None

    def add_scalars(self, step: int, scalars: Dict[str, float],
                    prefix: str = "train") -> None:
        if self._w is None:
            return
        for k, v in scalars.items():
            if isinstance(v, (int, float)):
                self._w.add_scalar(f"{prefix}/{k}", float(v), int(step))

    def flush(self) -> None:
        if self._w is not None:
            self._w.flush()

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
            self._w = None


def jsonl_to_tb(jsonl_path: str, logdir: str) -> int:
    """Convert an existing metrics.jsonl into TB event files.  Returns the
    number of records written; lines use their 'step' (or 'epoch') field as
    the global step."""
    import json

    w = TBWriter(logdir)
    n = 0
    with open(jsonl_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            step = int(rec.get("step", rec.get("epoch", n)))
            w.add_scalars(step, {k: v for k, v in rec.items()
                                 if k not in ("step", "epoch")})
            n += 1
    w.flush()
    w.close()
    return n
