"""Execution context threaded through layer functions.

Carries train/eval mode, a PRNG stream for dropout and stochastic training
strategies, and the active LoRA adapter dict.  All consumption happens at
trace time, so the generated XLA program is deterministic in structure.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def root_key(seed: int, impl: str = "threefry2x32") -> jax.Array:
    """Root PRNG key with an explicit implementation.

    The impl travels with the key through every split/fold_in/draw, so
    choosing it at the root switches the whole training step's RNG (dropout
    masks, CFM noise, anti-leakage draws).  "rbg" maps to the TPU hardware
    RNG (XLA RngBitGenerator) — measured 1.49x on the b8 joint train step vs
    threefry, whose generated bit-stream ops are ~40% of the step at the
    reference dropout rates.  "threefry2x32" is jax's default splittable
    stream (cross-backend bit-reproducible).

    Returns a NEW-style typed key (jax.random.key): the impl only travels
    with typed keys — ``jax.random.PRNGKey(seed, impl=...)`` returns raw
    uint32 data that downstream ops re-wrap as the default impl.
    """
    return jax.random.key(seed, impl=impl)


class Ctx:
    __slots__ = ("rng", "train", "lora", "lora_scale", "lora_dropout",
                 "lora_vids", "_n")

    def __init__(
        self,
        rng: Optional[jax.Array] = None,
        train: bool = False,
        lora: Optional[Dict[str, jax.Array]] = None,
        lora_scale: float = 1.0,
        lora_dropout: float = 0.0,
        lora_vids: Optional[jax.Array] = None,
    ):
        self.rng = rng
        self.train = bool(train)
        self.lora = lora
        self.lora_scale = lora_scale
        self.lora_dropout = lora_dropout
        # multi-voice adapter routing: when ``lora`` holds VOICE-STACKED
        # adapters ((V, r, in) / (V, out, r) — lora.stack_voice_loras),
        # ``lora_vids`` is the (B,) per-batch-row voice index each row's
        # delta is computed with (vLLM-style multi-LoRA serving)
        self.lora_vids = lora_vids
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
