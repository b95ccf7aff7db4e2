"""Execution context threaded through layer functions.

Carries train/eval mode, a PRNG stream for dropout and stochastic training
strategies, and the active LoRA adapter dict.  All consumption happens at
trace time, so the generated XLA program is deterministic in structure.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


class Ctx:
    __slots__ = ("rng", "train", "lora", "lora_scale", "lora_dropout", "_n")

    def __init__(
        self,
        rng: Optional[jax.Array] = None,
        train: bool = False,
        lora: Optional[Dict[str, jax.Array]] = None,
        lora_scale: float = 1.0,
        lora_dropout: float = 0.0,
    ):
        self.rng = rng
        self.train = bool(train)
        self.lora = lora
        self.lora_scale = lora_scale
        self.lora_dropout = lora_dropout
        self._n = 0

    def make_rng(self) -> jax.Array:
        if self.rng is None:
            raise ValueError("Ctx has no rng but a stochastic op requested one")
        self._n += 1
        return jax.random.fold_in(self.rng, self._n)

    def dropout(self, x: jax.Array, rate: float) -> jax.Array:
        """Inverted dropout; identity in eval mode or when rate == 0."""
        if not self.train or rate <= 0.0:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(self.make_rng(), keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


EVAL = Ctx(train=False)
