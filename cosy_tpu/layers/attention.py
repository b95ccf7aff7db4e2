"""Attention layers.

- ``rel_pos_mha``: wenet/ESPnet RelPositionMultiHeadedAttention with
  pos_bias_u/v and the Transformer-XL rel-shift trick (reference:
  cosyvoice/transformer/attention.py:200-330, modules.py:533-630).
- ``mha``: vanilla MultiHeadedAttention (reference: attention.py:26-197).
- ``diffusers_attention``: the estimator's to_q/to_k/to_v/to_out.0 attention
  (reference: modules.py:227-293).

All masks arrive as additive biases (0 / -1e10); shapes are static.  Softmax
is computed in fp32.  KV caches for AR decode are fixed-capacity arrays
updated with dynamic_update_slice — the TPU-native replacement for the
reference's concat-based cache (attention.py kv concat).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ctx import Ctx, EVAL
from ..params import P
from .basic import dense


def _split_heads(x: jax.Array, h: int) -> jax.Array:
    B, T, D = x.shape
    return x.reshape(B, T, h, D // h).transpose(0, 2, 1, 3)  # (B, h, T, d)


def _merge_heads(x: jax.Array) -> jax.Array:
    B, h, T, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, h * d)


def _softmax(scores: jax.Array, bias: Optional[jax.Array]) -> jax.Array:
    s = scores.astype(jnp.float32)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    return jax.nn.softmax(s, axis=-1)


def rel_shift(x: jax.Array) -> jax.Array:
    """(B, H, T1, 2*T2-1) -> (B, H, T1, T2) Transformer-XL relative shift.

    Row-major reshape trick identical to the reference (attention.py:225-247);
    jnp.reshape is row-major like torch.view, so the index gymnastics carry
    over exactly.
    """
    B, H, T1, P = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, P + 1, T1)[:, :, 1:, :]
    x = x.reshape(B, H, T1, P)
    return x[..., : P // 2 + 1]


def rel_pos_mha(
    p: P,
    name: str,
    x: jax.Array,  # (B, T, D) — self-attention input (post layer-norm)
    pos_emb: jax.Array,  # (1, 2T-1, D)
    bias: Optional[jax.Array],  # (B, T, T) or (B, 1, T, T) additive
    n_head: int,
    ctx: Ctx = EVAL,
    dropout_rate: float = 0.0,
    kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_index: Optional[jax.Array] = None,
    pos_k: Optional[jax.Array] = None,
    return_kv: bool = False,
) -> jax.Array | Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Relative-position multi-head self-attention.

    With ``kv_cache=(k_buf, v_buf)`` of shape (B, h, S, d) and a scalar
    ``cache_index``, runs one decode step: writes the new K/V at
    ``cache_index`` and attends over the first ``cache_index + T`` entries
    (enforced via ``bias``), returning (out, updated_cache).

    ``pos_k`` optionally supplies the already-projected positional keys
    (1, h, P, d) so the AR decode loop can hoist the linear_pos matmul out of
    the per-token step (the reference reprojects every step: llm.py:212-216 ->
    attention.py:301-306).
    """
    sp = p.sub(name)
    d_k = x.shape[-1] // n_head
    q = _split_heads(dense(sp, "linear_q", x, ctx), n_head)
    k = _split_heads(dense(sp, "linear_k", x, ctx), n_head)
    v = _split_heads(dense(sp, "linear_v", x, ctx), n_head)

    if kv_cache is not None:
        k_buf, v_buf = kv_cache
        k_buf = jax.lax.dynamic_update_slice(k_buf, k.astype(k_buf.dtype), (0, 0, cache_index, 0))
        v_buf = jax.lax.dynamic_update_slice(v_buf, v.astype(v_buf.dtype), (0, 0, cache_index, 0))
        k, v = k_buf, v_buf

    # positional projection: (1, P, D) -> (1, h, P, d)
    pk = pos_k if pos_k is not None else _split_heads(dense(sp, "linear_pos", pos_emb, ctx), n_head)

    bias_u = p[name + ".pos_bias_u"].astype(x.dtype)  # (h, d)
    bias_v = p[name + ".pos_bias_v"].astype(x.dtype)

    q_u = q + bias_u[None, :, None, :]
    q_v = q + bias_v[None, :, None, :]

    matrix_ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k)
    matrix_bd = jnp.einsum("bhtd,bhpd->bhtp", q_v, pk)
    if matrix_bd.shape[-1] != matrix_ac.shape[-1]:
        matrix_bd = rel_shift(matrix_bd)

    scores = (matrix_ac + matrix_bd) / math.sqrt(d_k)
    if bias is not None and bias.ndim == 3:
        bias = bias[:, None, :, :]
    attn = _softmax(scores, bias).astype(x.dtype)
    attn = ctx.dropout(attn, dropout_rate)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    out = dense(sp, "linear_out", _merge_heads(out), ctx)
    if kv_cache is not None or return_kv:
        return out, (k, v)
    return out


def mha(
    p: P,
    name: str,
    q_in: jax.Array,
    k_in: jax.Array,
    v_in: jax.Array,
    bias: Optional[jax.Array],
    n_head: int,
    ctx: Ctx = EVAL,
    dropout_rate: float = 0.0,
) -> jax.Array:
    """Vanilla multi-head attention (reference: attention.py:26-197)."""
    sp = p.sub(name)
    d_k = q_in.shape[-1] // n_head
    q = _split_heads(dense(sp, "linear_q", q_in, ctx), n_head)
    k = _split_heads(dense(sp, "linear_k", k_in, ctx), n_head)
    v = _split_heads(dense(sp, "linear_v", v_in, ctx), n_head)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(d_k)
    if bias is not None and bias.ndim == 3:
        bias = bias[:, None, :, :]
    attn = _softmax(scores, bias).astype(q_in.dtype)
    attn = ctx.dropout(attn, dropout_rate)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    return dense(sp, "linear_out", _merge_heads(out), ctx)


def diffusers_attention(
    p: P,
    name: str,
    x: jax.Array,  # (B, T, D)
    bias: Optional[jax.Array],  # (B, T, T) or (B, 1, T, T) additive
    heads: int,
    ctx: Ctx = EVAL,
    window: Optional[int] = None,  # local-band attention |t-s| <= window
) -> jax.Array:
    """diffusers-style attention with to_q/to_k/to_v/to_out.0 naming and
    explicit 1/sqrt(dim_head) scale (reference: modules.py:227-293).

    On TPU, long-sequence calls dispatch to the fused Pallas flash-attention
    kernel (ops/flash_attention.py); the head-shared (B, T, T) bias is
    consumed without per-head materialization.

    ``window`` (opt-in, EstimatorConfig.attn_window) restricts attention to
    the ±window local band — O(T·window) instead of O(T²) flops via the
    banded Pallas kernel on TPU, the same semantics via an additive band
    bias elsewhere."""
    sp = p.sub(name)
    q = _split_heads(dense(sp, "to_q", x, ctx), heads)
    k = _split_heads(dense(sp, "to_k", x, ctx), heads)
    v = _split_heads(dense(sp, "to_v", x, ctx), heads)
    scale = q.shape[-1] ** -0.5

    from ..ops.flash_attention import (banded_attention, flash_attention,
                                       use_banded, use_flash)
    from ..ops import masks as M

    T = x.shape[1]
    if window is not None:
        if bias is None and use_banded(T, q.shape[-1], window):
            out = banded_attention(q, k, v, scale, window)
            return dense(sp, "to_out.0", _merge_heads(out), ctx)
        band = M.band_bias(T, window, x.dtype)
        if bias is None:
            bias = jnp.broadcast_to(band[None], (x.shape[0], T, T))
        elif bias.ndim == 3:
            bias = bias + band[None]
        else:
            bias = bias + band[None, None]
    if use_flash(T, q.shape[-1]) and (bias is None or bias.ndim == 3):
        out = flash_attention(q, k, v, bias, scale)
        return dense(sp, "to_out.0", _merge_heads(out), ctx)

    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) * scale
    if bias is not None and bias.ndim == 3:
        bias = bias[:, None, :, :]
    attn = _softmax(scores, bias).astype(x.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    return dense(sp, "to_out.0", _merge_heads(out), ctx)
