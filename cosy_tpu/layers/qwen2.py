"""Qwen2 decoder backbone (CosyVoice2's LLM).

Reference behavior: cosyvoice/llm/llm.py:231-259 wraps HF Qwen2ForCausalLM
(Qwen2-0.5B for CosyVoice2).  This is a from-scratch functional
implementation of the public Qwen2 architecture — RMSNorm, rotary embeddings,
grouped-query attention, SwiGLU MLP — over flat param dicts with HF state
dict naming (``model.layers.N.self_attn.q_proj.weight`` ...), so the packed
CosyVoice2 llm.pt loads verbatim.

The KV cache is fixed-capacity (dynamic_update_slice) like the TransformerLM
decode path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ctx import Ctx, EVAL
from ..params import P, Params, KeyGen, init_linear, init_embedding
from ..ops import masks as M
from .basic import dense


@dataclass(frozen=True)
class Qwen2Config:
    """Qwen2-0.5B defaults (public HF config)."""

    hidden_size: int = 896
    intermediate_size: int = 4864
    num_hidden_layers: int = 24
    num_attention_heads: int = 14
    num_key_value_heads: int = 2
    head_dim: int = 64
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    vocab_size: int = 151936
    max_position_embeddings: int = 32768


def rms_norm(p: P, name: str, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * p[name + ".weight"].astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """(T,) -> cos/sin (T, head_dim); (B, T) -> (B, T, head_dim) for
    per-sample positions (slot-local continuous-batching decode).  HF
    half-rotation layout."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv  # (..., T, hd/2)
    emb = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, H, T, d); cos/sin: (T, d) shared or (B, T, d) per-sample.
    HF rotate_half convention."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    if cos.ndim == 3:
        cos, sin = cos[:, None], sin[:, None]  # (B, 1, T, d)
    else:
        cos, sin = cos[None, None], sin[None, None]
    return x * cos + rotated * sin


def qwen2_attention(
    p: P,
    cfg: Qwen2Config,
    x: jax.Array,  # (B, T, D)
    positions: jax.Array,  # (T,) shared or (B, T) per-sample (slot-local)
    bias: Optional[jax.Array],  # additive (B, 1|T, S) or None
    ctx: Ctx = EVAL,
    kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_index=None,  # scalar, or (B,) per-sample columns (requires T == 1)
) -> jax.Array | Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    B, T, D = x.shape
    H, KV, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q = dense(p, "q_proj", x, ctx).reshape(B, T, H, d).transpose(0, 2, 1, 3)
    k = dense(p, "k_proj", x, ctx).reshape(B, T, KV, d).transpose(0, 2, 1, 3)
    v = dense(p, "v_proj", x, ctx).reshape(B, T, KV, d).transpose(0, 2, 1, 3)

    cos, sin = rope_cos_sin(positions, d, cfg.rope_theta)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if kv_cache is not None:
        k_buf, v_buf = kv_cache
        ci = jnp.asarray(cache_index)
        if ci.ndim == 1:  # per-sample column: one B-row scatter (decode T=1)
            iota_b = jnp.arange(B)
            k_buf = k_buf.at[iota_b, :, ci, :].set(k[:, :, 0].astype(k_buf.dtype))
            v_buf = v_buf.at[iota_b, :, ci, :].set(v[:, :, 0].astype(v_buf.dtype))
        else:
            k_buf = jax.lax.dynamic_update_slice(k_buf, k.astype(k_buf.dtype), (0, 0, cache_index, 0))
            v_buf = jax.lax.dynamic_update_slice(v_buf, v.astype(v_buf.dtype), (0, 0, cache_index, 0))
        k, v = k_buf, v_buf

    rep = H // KV
    k = jnp.repeat(k, rep, axis=1)
    v = jnp.repeat(v, rep, axis=1)

    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(jnp.asarray(d, jnp.float32)).astype(x.dtype)
    s = scores.astype(jnp.float32)
    if bias is not None:
        s = s + (bias[:, None] if bias.ndim == 3 else bias).astype(jnp.float32)
    attn = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    out = dense(p, "o_proj", out.transpose(0, 2, 1, 3).reshape(B, T, H * d), ctx)
    if kv_cache is not None:
        return out, (k_buf, v_buf)
    return out


def qwen2_mlp(p: P, x: jax.Array, ctx: Ctx = EVAL) -> jax.Array:
    gate = jax.nn.silu(dense(p, "gate_proj", x, ctx))
    up = dense(p, "up_proj", x, ctx)
    return dense(p, "down_proj", gate * up, ctx)


def qwen2_layer(
    p: P, cfg: Qwen2Config, x: jax.Array, positions, bias, ctx: Ctx = EVAL,
    kv_cache=None, cache_index=None,
):
    h = rms_norm(p, "input_layernorm", x, cfg.rms_norm_eps)
    out = qwen2_attention(p.sub("self_attn"), cfg, h, positions, bias, ctx,
                          kv_cache=kv_cache, cache_index=cache_index)
    new_cache = None
    if kv_cache is not None:
        out, new_cache = out
    x = x + out
    h = rms_norm(p, "post_attention_layernorm", x, cfg.rms_norm_eps)
    x = x + qwen2_mlp(p.sub("mlp"), h, ctx)
    if kv_cache is not None:
        return x, new_cache
    return x


def qwen2_forward(
    p: P,  # rooted at "model." (embed_tokens, layers.N, norm)
    cfg: Qwen2Config,
    inputs_embeds: jax.Array,  # (B, T, D)
    lengths: jax.Array,  # (B,)
    ctx: Ctx = EVAL,
) -> jax.Array:
    """Full-sequence causal forward -> last hidden states (B, T, D)
    (llm.py:236-245: Qwen2Encoder.forward uses hidden_states[-1])."""
    B, T, _ = inputs_embeds.shape
    pad = M.make_non_pad_mask(lengths, T)  # (B, T) True=valid
    causal = jnp.tril(jnp.ones((T, T), bool))
    allowed = causal[None] & pad[:, None, :]
    bias = M.mask_to_bias(allowed, inputs_embeds.dtype)
    positions = jnp.arange(T)
    x = inputs_embeds
    for i in range(cfg.num_hidden_layers):
        x = qwen2_layer(p.sub(f"layers.{i}"), cfg, x, positions, bias, ctx)
    return rms_norm(p, "norm", x, cfg.rms_norm_eps)


def init_qwen2_params(key: jax.Array, cfg: Qwen2Config, prefix: str = "model") -> Params:
    d: Params = {}
    kg = KeyGen(key)
    pre = prefix + "." if prefix else ""
    D, H, KV, hd = cfg.hidden_size, cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    init_embedding(kg(), d, pre + "embed_tokens", cfg.vocab_size, D)
    for i in range(cfg.num_hidden_layers):
        lp = f"{pre}layers.{i}"
        init_linear(kg(), d, f"{lp}.self_attn.q_proj", D, H * hd, bias=True)
        init_linear(kg(), d, f"{lp}.self_attn.k_proj", D, KV * hd, bias=True)
        init_linear(kg(), d, f"{lp}.self_attn.v_proj", D, KV * hd, bias=True)
        init_linear(kg(), d, f"{lp}.self_attn.o_proj", H * hd, D, bias=False)
        init_linear(kg(), d, f"{lp}.mlp.gate_proj", D, cfg.intermediate_size, bias=False)
        init_linear(kg(), d, f"{lp}.mlp.up_proj", D, cfg.intermediate_size, bias=False)
        init_linear(kg(), d, f"{lp}.mlp.down_proj", cfg.intermediate_size, D, bias=False)
        d[f"{lp}.input_layernorm.weight"] = jnp.ones((D,), jnp.float32)
        d[f"{lp}.post_attention_layernorm.weight"] = jnp.ones((D,), jnp.float32)
    d[pre + "norm.weight"] = jnp.ones((D,), jnp.float32)
    return d
