"""ASR-style Transformer decoders (left-to-right and bidirectional).

Reference: cosyvoice/transformer/decoder.py (TransformerDecoder :33-250,
BiTransformerDecoder :253-356) + decoder_layer.py.  Dead on every TTS path
(SURVEY.md §2.3) but part of the op-library surface; implemented for
registry completeness with exact torch weight naming
(``decoders.N.{self_attn,src_attn}.linear_{q,k,v,out}``, ``norm1..3``,
``feed_forward.w_{1,2}``, ``embed.0`` embedding, ``output_layer``).

TPU-first notes: masks are additive biases built once per call; the layer
stack is a plain Python loop (training-time graph, fused by XLA); no
incremental decode cache is provided because nothing in the TTS product
drives ASR beam search.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ctx import Ctx, EVAL
from ..params import P, Params, KeyGen, init_linear, init_embedding
from ..ops import masks as M
from .attention import mha
from .basic import dense, embedding, layer_norm
from .posenc import abs_pos_encoding


@dataclass(frozen=True)
class DecoderConfig:
    """decoder.py:59-77 constructor args (the on-registry subset)."""

    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    src_attention: bool = True
    activation: str = "relu"
    layer_norm_eps: float = 1e-5


def _ffn(p: P, name: str, x: jax.Array, cfg: DecoderConfig, ctx: Ctx) -> jax.Array:
    h = dense(p.sub(name), "w_1", x, ctx)
    h = jax.nn.relu(h)
    h = ctx.dropout(h, cfg.dropout_rate)
    return dense(p.sub(name), "w_2", h, ctx)


def decoder_layer(
    p: P,
    name: str,
    cfg: DecoderConfig,
    x: jax.Array,  # (B, L, D)
    tgt_bias: jax.Array,  # (B, L, L) additive
    memory: jax.Array,  # (B, S, D)
    mem_bias: jax.Array,  # (B, 1, S) additive (broadcast over queries)
    ctx: Ctx,
) -> jax.Array:
    """Pre-norm DecoderLayer (decoder_layer.py:62-132)."""
    sp = p.sub(name)
    eps = cfg.layer_norm_eps

    h = layer_norm(sp, "norm1", x, eps=eps)
    x = x + ctx.dropout(
        mha(sp, "self_attn", h, h, h, tgt_bias, cfg.attention_heads, ctx,
            dropout_rate=cfg.dropout_rate), cfg.dropout_rate)

    if cfg.src_attention:
        h = layer_norm(sp, "norm2", x, eps=eps)
        x = x + ctx.dropout(
            mha(sp, "src_attn", h, memory, memory,
                jnp.broadcast_to(mem_bias, (x.shape[0], x.shape[1], memory.shape[1])),
                cfg.attention_heads, ctx, dropout_rate=cfg.dropout_rate),
            cfg.dropout_rate)

    h = layer_norm(sp, "norm3", x, eps=eps)
    return x + ctx.dropout(_ffn(sp, "feed_forward", h, cfg, ctx), cfg.dropout_rate)


def transformer_decoder_forward(
    p: P,
    cfg: DecoderConfig,
    memory: jax.Array,  # (B, S, D)
    memory_len: jax.Array,  # (B,)
    ys_in: jax.Array,  # (B, L) int token ids (already sos-prefixed)
    ys_len: jax.Array,  # (B,)
    ctx: Ctx = EVAL,
):
    """decoder.py:117-180: embed+PE -> N layers -> after_norm -> output layer.

    Returns (logits (B, L, V), olens (B,))."""
    B, L = ys_in.shape
    S = memory.shape[1]

    pad = M.make_non_pad_mask(ys_len, L)  # (B, L) bool
    causal = jnp.arange(L)[:, None] >= jnp.arange(L)[None, :]
    tgt_mask = pad[:, None, :] & causal[None]  # (B, L, L)
    tgt_bias = jnp.where(tgt_mask, 0.0, M.NEG_BIAS).astype(memory.dtype)
    mem_bias = jnp.where(M.make_non_pad_mask(memory_len, S)[:, None, :],
                         0.0, M.NEG_BIAS).astype(memory.dtype)

    x = embedding(p, "embed.0", ys_in)
    x, _ = abs_pos_encoding(x)  # PositionalEncoding w/ x*sqrt(d) (embed.1)
    x = ctx.dropout(x, cfg.positional_dropout_rate)

    for i in range(cfg.num_blocks):
        x = decoder_layer(p, f"decoders.{i}", cfg, x, tgt_bias, memory, mem_bias, ctx)
    x = layer_norm(p, "after_norm", x, eps=cfg.layer_norm_eps)
    logits = dense(p, "output_layer", x, ctx)
    return logits, jnp.sum(pad, axis=-1)


def bi_transformer_decoder_forward(
    p: P,
    cfg: DecoderConfig,
    memory: jax.Array,
    memory_len: jax.Array,
    ys_in: jax.Array,
    ys_len: jax.Array,
    r_ys_in: jax.Array,  # reversed targets for the right-to-left decoder
    reverse_weight: float = 0.0,
    r_num_blocks: int | None = None,
    ctx: Ctx = EVAL,
):
    """BiTransformerDecoder (decoder.py:253-356): left decoder always, right
    decoder (its own, possibly shallower, block count) when
    reverse_weight > 0."""
    from dataclasses import replace as _rep

    l_x, olens = transformer_decoder_forward(
        p.sub("left_decoder"), cfg, memory, memory_len, ys_in, ys_len, ctx)
    r_x = jnp.zeros(())
    if reverse_weight > 0.0:
        r_cfg = cfg if r_num_blocks is None else _rep(cfg, num_blocks=r_num_blocks)
        r_x, _ = transformer_decoder_forward(
            p.sub("right_decoder"), r_cfg, memory, memory_len, r_ys_in, ys_len, ctx)
    return l_x, r_x, olens


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_transformer_decoder(key: jax.Array, cfg: DecoderConfig) -> Params:
    kg = KeyGen(key)
    d = cfg.encoder_output_size
    params: Params = {}
    init_embedding(kg(), params, "embed.0", cfg.vocab_size, d)
    for i in range(cfg.num_blocks):
        pre = f"decoders.{i}."
        for attn in (("self_attn",) + (("src_attn",) if cfg.src_attention else ())):
            for lin in ("linear_q", "linear_k", "linear_v", "linear_out"):
                init_linear(kg(), params, pre + f"{attn}.{lin}", d, d)
        init_linear(kg(), params, pre + "feed_forward.w_1", d, cfg.linear_units)
        init_linear(kg(), params, pre + "feed_forward.w_2", cfg.linear_units, d)
        for n in ("norm1", "norm2", "norm3"):
            params[pre + n + ".weight"] = jnp.ones((d,), jnp.float32)
            params[pre + n + ".bias"] = jnp.zeros((d,), jnp.float32)
    params["after_norm.weight"] = jnp.ones((d,), jnp.float32)
    params["after_norm.bias"] = jnp.zeros((d,), jnp.float32)
    init_linear(kg(), params, "output_layer", d, cfg.vocab_size)
    return params


def init_bi_transformer_decoder(key: jax.Array, cfg: DecoderConfig,
                                r_num_blocks: int = 0) -> Params:
    params: Params = {}
    left = init_transformer_decoder(jax.random.fold_in(key, 0), cfg)
    params.update({"left_decoder." + k: v for k, v in left.items()})
    if r_num_blocks:
        from dataclasses import replace as _rep

        right = init_transformer_decoder(
            jax.random.fold_in(key, 1), _rep(cfg, num_blocks=r_num_blocks))
        params.update({"right_decoder." + k: v for k, v in right.items()})
    return params
