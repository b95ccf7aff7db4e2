"""Positional encodings.

- Transformer-XL style relative PE table (positive+negative halves), used by
  both the ESPnet variant (with x * sqrt(d) scaling; reference:
  cosyvoice/transformer/embedding.py:201-302) and the finetune-framework
  variant (without scaling; reference: modules.py:382-428).
- Sinusoidal timestep embedding with scale=1000 for the CFM estimator
  (reference: modules.py:20-42 — the scale factor the reference's README calls
  out as convergence-critical).

Tables are built with jnp at trace time; under jit they constant-fold.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sinusoid_table(max_len: int, d_model: int) -> jax.Array:
    """(max_len, d_model) with pe[p, 2i] = sin(p w_i), pe[p, 2i+1] = cos(p w_i)."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * -(math.log(10000.0) / d_model)
    )
    ang = pos * div[None, :]
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe


def rel_pos_table(T: int, d_model: int) -> jax.Array:
    """(1, 2T-1, d) relative-position table ordered [pos T-1 .. 0, -1 .. -(T-1)].

    Matches EspnetRelPositionalEncoding.extend_pe (embedding.py:224-254): the
    positive half is time-reversed, then rows for negative positions 1..T-1.
    """
    pos = jnp.arange(T, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * -(math.log(10000.0) / d_model)
    )
    ang = pos * div[None, :]
    pe_pos = jnp.zeros((T, d_model), jnp.float32)
    pe_pos = pe_pos.at[:, 0::2].set(jnp.sin(ang))
    pe_pos = pe_pos.at[:, 1::2].set(jnp.cos(ang))
    pe_neg = jnp.zeros((T, d_model), jnp.float32)
    pe_neg = pe_neg.at[:, 0::2].set(jnp.sin(-ang))
    pe_neg = pe_neg.at[:, 1::2].set(jnp.cos(-ang))
    pe = jnp.concatenate([jnp.flip(pe_pos, axis=0), pe_neg[1:]], axis=0)
    return pe[None]


# ---------------------------------------------------------------------------
# Off-path PE variants (registry parity; none is on a TTS hot path)
# ---------------------------------------------------------------------------


def abs_pos_encoding(x: jax.Array, offset: int = 0, apply_xscale: bool = True):
    """PositionalEncoding (embedding.py:26-118): x*sqrt(d) + pe[offset:+T].

    Returns (x_out, pos_emb) like the torch module."""
    T, d = x.shape[1], x.shape[-1]
    pe = sinusoid_table(offset + T, d)[None, offset:offset + T].astype(x.dtype)
    if apply_xscale:
        x = x * jnp.asarray(d, x.dtype) ** 0.5
    return x + pe, pe


def whisper_pos_table(max_len: int, d_model: int) -> jax.Array:
    """WhisperPositionalEncoding (embedding.py:150-165): concat([sin, cos])
    layout (not interleaved), xscale 1."""
    inc = math.log(10000.0) / (d_model // 2 - 1)
    inv = jnp.exp(-inc * jnp.arange(d_model // 2, dtype=jnp.float32))
    ang = jnp.arange(max_len, dtype=jnp.float32)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)


def whisper_pos_encoding(x: jax.Array, offset: int = 0):
    """x + whisper table slice; xscale=1 (embedding.py:156)."""
    T, d = x.shape[1], x.shape[-1]
    pe = whisper_pos_table(offset + T, d)[None, offset:offset + T].astype(x.dtype)
    return x + pe, pe


def learnable_pos_encoding(pe_param: jax.Array, x: jax.Array, offset: int = 0):
    """LearnablePositionalEncoding (embedding.py:168-176): x + learned table,
    xscale 1.  ``pe_param`` is the (1, max_len, d) parameter."""
    T = x.shape[1]
    pe = pe_param[:, offset:offset + T].astype(x.dtype)
    return x + pe, pe


def no_pos_encoding(x: jax.Array, offset: int = 0):
    """NoPositionalEncoding (embedding.py:179-199)."""
    return x, jnp.zeros((1, x.shape[1], x.shape[-1]), x.dtype)


def timestep_embedding(t: jax.Array, dim: int, scale: float = 1000.0) -> jax.Array:
    """(B,) -> (B, dim) sinusoidal timestep embedding.

    CRITICAL: scale defaults to 1000 to match Matcha-TTS/CosyVoice pretrained
    weights (reference: modules.py:27-42; README_EN.md:178-183 documents that a
    wrong scale silently stalls convergence at loss ~8).

    Note the layout differs from rel_pos_table: here it is
    cat([sin(all), cos(all)]) over half_dim frequencies, not interleaved.
    """
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    ang = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
