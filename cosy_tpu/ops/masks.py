"""Mask builders (TPU-friendly: all static shapes, boolean masks or additive
biases; no data-dependent shapes).

Reference semantics: utils.py:20-109 and cosyvoice/utils/mask.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_BIAS = -1.0e10  # reference: utils.py:108 mask_to_bias


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """True at padded positions.  (B,) int -> (B, T) bool.

    Reference: utils.py:20-41.  max_len must be static on TPU.
    """
    idx = jnp.arange(max_len)[None, :]
    return idx >= lengths[:, None]


def make_non_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    return ~make_pad_mask(lengths, max_len)


def band_bias(T: int, window: int, dtype) -> jax.Array:
    """(T, T) additive bias for local-band self-attention: 0 where
    |i - j| <= window, NEG_BIAS outside.  The XLA oracle for the banded
    Pallas kernel (ops/flash_attention.banded_attention) and the CPU path of
    the opt-in windowed estimator attention."""
    i = jnp.arange(T)
    ok = jnp.abs(i[:, None] - i[None, :]) <= window
    return jnp.where(ok, 0.0, NEG_BIAS).astype(dtype)


def subsequent_chunk_mask(size: int, chunk_size, num_left_chunks: int = -1) -> jax.Array:
    """(size, size) bool mask, True where attention is allowed.

    Position i may attend to positions j < (i // chunk + 1) * chunk, optionally
    limited to num_left_chunks history chunks.  chunk_size == 1 is causal.
    Reference: utils.py:44-54.  chunk_size may be a traced scalar.
    """
    pos = jnp.arange(size)
    block = (pos // chunk_size + 1) * chunk_size
    allowed = pos[None, :] < block[:, None]
    if num_left_chunks >= 0:
        start = jnp.maximum((pos // chunk_size - num_left_chunks) * chunk_size, 0)
        allowed = allowed & (pos[None, :] >= start[:, None])
    return allowed


def add_optional_chunk_mask(
    T: int,
    masks: jax.Array,  # (B, 1, T) bool, True = valid
    use_dynamic_chunk: bool,
    use_dynamic_left_chunk: bool,
    decoding_chunk_size: int,
    static_chunk_size: int,
    num_decoding_left_chunks: int,
    rng: Optional[jax.Array] = None,
    enable_full_context: bool = True,
) -> jax.Array:
    """(B, T, T) bool attention mask combining padding + chunk structure.

    Reference: utils.py:57-100.  Random dynamic-chunk selection uses the JAX
    rng instead of torch.randint; the distribution matches the reference
    (chunk ~ U[1, T); > T/2 -> full context; else chunk %% 25 + 1).
    """
    if use_dynamic_chunk:
        if decoding_chunk_size < 0:
            chunk = T
            chunk_masks = subsequent_chunk_mask(T, chunk, -1)
        elif decoding_chunk_size > 0:
            chunk_masks = subsequent_chunk_mask(T, decoding_chunk_size, num_decoding_left_chunks)
        else:
            assert rng is not None, "dynamic chunk training needs an rng"
            k_chunk, k_left = jax.random.split(rng)
            draw = jax.random.randint(k_chunk, (), 1, max(T, 2))
            small = draw % 25 + 1
            full = enable_full_context & (draw > T // 2)
            chunk = jnp.where(full, T, small)
            pos = jnp.arange(T)
            block = (pos // chunk + 1) * chunk
            allowed = pos[None, :] < block[:, None]
            if use_dynamic_left_chunk:
                # reference mask.py:214-217: small chunks draw a random
                # left-context limit num_left ~ U[0, (T-1)//chunk);
                # full-context draws keep unlimited history
                max_left = jnp.maximum((T - 1) // chunk, 1)
                nleft = jax.random.randint(k_left, (), 0, 1 << 30) % max_left
                start = jnp.maximum((pos // chunk - nleft) * chunk, 0)
                limited = allowed & (pos[None, :] >= start[:, None])
                allowed = jnp.where(full, allowed, limited)
            chunk_masks = allowed
        chunk_masks = masks & chunk_masks[None, :, :]
    elif static_chunk_size > 0:
        chunk_masks = subsequent_chunk_mask(T, static_chunk_size, num_decoding_left_chunks)
        chunk_masks = masks & chunk_masks[None, :, :]
    else:
        chunk_masks = jnp.broadcast_to(masks, (masks.shape[0], T, T))
    # guard against fully-masked rows (reference: utils.py:98-99)
    dead = jnp.sum(chunk_masks, axis=-1, keepdims=True) == 0
    return chunk_masks | dead


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """bool mask (True = attend) -> additive bias (0 / -1e10). Reference: utils.py:103-109."""
    return (1.0 - mask.astype(dtype)) * NEG_BIAS


def prompt_isolation_bias(seq_len: int, prompt_len, dtype=jnp.float32) -> jax.Array:
    """(seq_len, seq_len) additive bias blocking prompt<->target attention.

    prompt_len may be a traced scalar (0 disables).  Uses the same -1e10
    bias convention as mask_to_bias rather than -inf: the reference adds
    float('-inf') (modules.py:844-879) which poisons softmax rows that are
    also padding-masked; a large-negative bias is numerically safe and
    equivalent post-softmax.
    """
    idx = jnp.arange(seq_len)
    in_prompt = idx < prompt_len
    cross = in_prompt[:, None] != in_prompt[None, :]
    valid = (prompt_len > 0) & (prompt_len < seq_len)
    return jnp.where(cross & valid, NEG_BIAS, 0.0).astype(dtype)
