"""Token sampling for AR decode — JAX ports of the reference samplers.

Reference: cosyvoice/utils/common.py:111-139 (ras_sampling / nucleus_sampling /
random_sampling).  Implemented with static shapes for use inside
``lax.while_loop`` decode steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nucleus_sample(rng: jax.Array, logits: jax.Array, top_p: float = 0.8, top_k: int = 25) -> jax.Array:
    """Sample from the top-p / top-k head of softmax(logits)  ((V,) -> scalar).

    Matches the reference inclusion rule (common.py:119-135): token i (in
    descending-prob order) is kept iff the cumulative probability *before* it
    is < top_p and fewer than top_k tokens are kept.

    Only the top_k probabilities can ever be kept, so the candidate set is
    reduced with ``lax.top_k`` (ties break toward the lower index, the same
    order a stable descending argsort gives) instead of a full V-element
    sort — this runs once per decoded token inside the AR while-loop, and a
    4k-element argsort there costs more than an entire transformer layer."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    k = min(top_k, logits.shape[-1])
    top_vals, top_idx = jax.lax.top_k(probs, k)  # sorted descending
    cum_before = jnp.cumsum(top_vals) - top_vals
    kept = jnp.where(cum_before < top_p, top_vals, 0.0)
    i = jax.random.categorical(rng, jnp.log(jnp.maximum(kept, 1e-30)))
    return top_idx[i]


def random_sample(rng: jax.Array, logits: jax.Array) -> jax.Array:
    return jax.random.categorical(rng, logits.astype(jnp.float32))


def ras_sample(
    rng: jax.Array,
    logits: jax.Array,  # (V,) weighted scores (log-probs or logits)
    decoded: jax.Array,  # (H,) history buffer, -1 for empty slots
    num_decoded: jax.Array,  # scalar count of valid history entries
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
) -> jax.Array:
    """Repetition-aware sampling (VALL-E 2 style; common.py:111-117).

    If the nucleus sample appears >= win_size * tau_r times in the last
    win_size decoded tokens, fall back to sampling the full distribution.
    """
    k1, k2 = jax.random.split(rng)
    cand = nucleus_sample(k1, logits, top_p, top_k)
    H = decoded.shape[0]
    pos = jnp.arange(H)
    in_window = (pos >= num_decoded - win_size) & (pos < num_decoded)
    rep = jnp.sum(jnp.where(in_window & (decoded == cand), 1, 0))
    fallback = rep >= win_size * tau_r
    alt = random_sample(k2, logits)
    return jnp.where(fallback, alt, cand)
