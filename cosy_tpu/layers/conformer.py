"""Conformer / Transformer encoder stack.

One parameterized implementation serves the three encoder instances in the
CosyVoice-300M stack:

- flow token encoder: 6-block Conformer, no CNN/macaron (reference:
  flow_model.py:663-677)
- LLM text encoder: 6-block Conformer, causal (static_chunk_size=1)
- LLM backbone: 14-block Transformer, causal, 'linear_legacy' input

Weight names follow the torch modules exactly (encoders.N.self_attn.linear_q,
feed_forward.w_1, norm_mha, embed.out.0, after_norm, ...).

Reference behavior: cosyvoice/transformer/{encoder,encoder_layer,convolution,
positionwise_feed_forward,subsampling,embedding}.py and the self-contained
copies in modules.py:431-793.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import EncoderConfig
from ..ctx import Ctx, EVAL
from ..params import P, Params, KeyGen, init_linear, init_norm, init_conv1d
from ..ops import masks as M
from .basic import ACT, conv1d, dense, glu, layer_norm
from .attention import rel_pos_mha, mha
from .posenc import rel_pos_table


# ---------------------------------------------------------------------------
# Sub-modules
# ---------------------------------------------------------------------------


def positionwise_ff(p: P, name: str, x: jax.Array, act, dropout: float, ctx: Ctx) -> jax.Array:
    """w_2(dropout(act(w_1(x)))) (reference: positionwise_feed_forward.py)."""
    sp = p.sub(name)
    h = act(dense(sp, "w_1", x, ctx))
    h = ctx.dropout(h, dropout)
    return dense(sp, "w_2", h, ctx)


def moe_ffn(p: P, name: str, x: jax.Array, n_expert: int, n_expert_per_token: int,
            act, dropout: float, ctx: Ctx) -> jax.Array:
    """Mixture-of-experts feed-forward (positionwise_feed_forward.py:58-115;
    weight names gate / experts.{i}.w_1/w_2).  Off every CosyVoice model path
    (the reference never instantiates it) but part of the op-library surface.

    TPU-first formulation: instead of the reference's per-expert gather loop
    (data-dependent shapes), every expert runs densely over all tokens and is
    combined with its routing weight (zero for unrouted tokens) — static
    shapes, MXU-batched, the standard dense-MoE arrangement on TPU."""
    sp = p.sub(name)
    B, L, D = x.shape
    xs = x.reshape(-1, D)
    router = dense(sp, "gate", xs, ctx)  # (B*L, n_expert)
    logits, indices = jax.lax.top_k(router, n_expert_per_token)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=1).astype(x.dtype)
    # dense routing matrix: w_full[n, e] = routing weight (0 when unrouted)
    w_full = jnp.zeros((xs.shape[0], n_expert), x.dtype)
    for k in range(n_expert_per_token):
        w_full = w_full.at[jnp.arange(xs.shape[0]), indices[:, k]].add(weights[:, k])

    if "experts_stacked.w_1.weight" in sp:
        # stacked experts (E, H, D)/(E, D, H): one batched einsum per matmul.
        # Expert-parallel scale-out: tp.py shards the leading E axis over the
        # mesh ``model`` axis, so each device computes its experts and XLA
        # inserts the psum for the routed combine (the contraction over E).
        se = sp.sub("experts_stacked")
        w1, b1 = se.get("w_1.weight"), se.get("w_1.bias")
        w2, b2 = se.get("w_2.weight"), se.get("w_2.bias")
        h = jnp.einsum("nd,ehd->neh", xs, w1.astype(x.dtype)) + b1.astype(x.dtype)[None]
        h = act(h)
        if ctx.train and dropout > 0.0:
            h = ctx.dropout(h, dropout)
        y = jnp.einsum("neh,edh->ned", h, w2.astype(x.dtype)) + b2.astype(x.dtype)[None]
        out = jnp.einsum("ne,ned->nd", w_full, y)
        return out.reshape(B, L, D)

    out = jnp.zeros_like(xs)
    for i in range(n_expert):
        y = positionwise_ff(sp, f"experts.{i}", xs, act, dropout, ctx)
        out = out + w_full[:, i][:, None] * y
    return out.reshape(B, L, D)


def convolution_module(
    p: P,
    name: str,
    x: jax.Array,  # (B, T, C)
    pad_mask: jax.Array,  # (B, 1, T) bool, True = valid
    act,
    kernel_size: int,
    causal: bool,
    norm: str,
    eps: float,
    ctx: Ctx,
) -> jax.Array:
    """Conformer conv module: pointwise->GLU->depthwise->norm->act->pointwise
    (reference: convolution.py / modules.py:454-530)."""
    sp = p.sub(name)
    xc = (x * pad_mask.transpose(0, 2, 1).astype(x.dtype)).transpose(0, 2, 1)  # (B, C, T)
    C = xc.shape[1]
    xc = conv1d(sp, "pointwise_conv1", xc, ctx=ctx)
    xc = glu(xc, axis=1)
    if causal:
        xc = jnp.pad(xc, ((0, 0), (0, 0), (kernel_size - 1, 0)))
        xc = conv1d(sp, "depthwise_conv", xc, groups=C, ctx=ctx)
    else:
        xc = conv1d(sp, "depthwise_conv", xc, padding=(kernel_size - 1) // 2, groups=C, ctx=ctx)
    if norm == "layer_norm":
        xc = layer_norm(sp, "norm", xc.transpose(0, 2, 1), eps=1e-5).transpose(0, 2, 1)
    else:  # batch_norm in eval mode: use running stats
        mean = p[name + ".norm.running_mean"].astype(jnp.float32)[None, :, None]
        var = p[name + ".norm.running_var"].astype(jnp.float32)[None, :, None]
        w = p[name + ".norm.weight"].astype(jnp.float32)[None, :, None]
        b = p[name + ".norm.bias"].astype(jnp.float32)[None, :, None]
        xf = (xc.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
        xc = (xf * w + b).astype(xc.dtype)
    xc = act(xc)
    xc = conv1d(sp, "pointwise_conv2", xc, ctx=ctx)
    xc = xc * pad_mask.astype(xc.dtype)
    return xc.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# Encoder layers
# ---------------------------------------------------------------------------


def conformer_layer(
    p: P,
    name: str,
    cfg: EncoderConfig,
    x: jax.Array,
    attn_bias: jax.Array,
    pos_emb: jax.Array,
    pad_mask: jax.Array,
    ctx: Ctx,
) -> jax.Array:
    """Pre-norm conformer block (reference: encoder_layer.py:110-236)."""
    sp = p.sub(name)
    act = ACT[cfg.activation_type]
    eps = cfg.layer_norm_eps
    ff_scale = 0.5 if cfg.macaron_style else 1.0

    if cfg.macaron_style:
        h = layer_norm(sp, "norm_ff_macaron", x, eps=eps)
        x = x + ff_scale * ctx.dropout(
            positionwise_ff(sp, "feed_forward_macaron", h, act, cfg.dropout_rate, ctx),
            cfg.dropout_rate,
        )

    h = layer_norm(sp, "norm_mha", x, eps=eps)
    h = rel_pos_mha(
        sp, "self_attn", h, pos_emb, attn_bias, cfg.attention_heads, ctx,
        dropout_rate=cfg.attention_dropout_rate,
    )
    x = x + ctx.dropout(h, cfg.dropout_rate)

    if cfg.use_cnn_module:
        h = layer_norm(sp, "norm_conv", x, eps=eps)
        h = convolution_module(
            sp, "conv_module", h, pad_mask, act, cfg.cnn_module_kernel,
            cfg.causal, cfg.cnn_module_norm, eps, ctx,
        )
        x = x + ctx.dropout(h, cfg.dropout_rate)

    h = layer_norm(sp, "norm_ff", x, eps=eps)
    x = x + ff_scale * ctx.dropout(
        positionwise_ff(sp, "feed_forward", h, act, cfg.dropout_rate, ctx),
        cfg.dropout_rate,
    )

    if cfg.use_cnn_module:
        x = layer_norm(sp, "norm_final", x, eps=eps)
    return x


def transformer_layer(
    p: P,
    name: str,
    cfg: EncoderConfig,
    x: jax.Array,
    attn_bias: jax.Array,
    pos_emb: jax.Array,
    ctx: Ctx,
    kv_cache=None,
    cache_index=None,
    pos_k=None,
    return_kv: bool = False,
):
    """Pre-norm transformer block with rel-pos self-attention
    (reference: encoder_layer.py:24-109).

    ``return_kv=True`` (without a cache) also returns this layer's split-head
    K/V so a prefill pass can seed a decode cache without recomputing the
    norm1 + K/V projections (the reference recomputes them: llm.py:276-283)."""
    sp = p.sub(name)
    eps = cfg.layer_norm_eps
    act = ACT[cfg.activation_type]

    h = layer_norm(sp, "norm1", x, eps=eps)
    if cfg.selfattention_layer_type == "rel_selfattn":
        out = rel_pos_mha(
            sp, "self_attn", h, pos_emb, attn_bias, cfg.attention_heads, ctx,
            dropout_rate=cfg.attention_dropout_rate,
            kv_cache=kv_cache, cache_index=cache_index, pos_k=pos_k,
            return_kv=return_kv,
        )
    else:
        out = mha(sp, "self_attn", h, h, h, attn_bias, cfg.attention_heads, ctx,
                  dropout_rate=cfg.attention_dropout_rate)
    new_cache = None
    if kv_cache is not None or return_kv:
        out, new_cache = out
    x = x + ctx.dropout(out, cfg.dropout_rate)

    h = layer_norm(sp, "norm2", x, eps=eps)
    x = x + ctx.dropout(positionwise_ff(sp, "feed_forward", h, act, cfg.dropout_rate, ctx),
                        cfg.dropout_rate)
    if kv_cache is not None or return_kv:
        return x, new_cache
    return x


# ---------------------------------------------------------------------------
# Full encoder
# ---------------------------------------------------------------------------


def embed_input(p: P, cfg: EncoderConfig, xs: jax.Array, ctx: Ctx, xscale: bool = True):
    """Input projection + positional table.

    linear: Linear + LayerNorm(1e-5) + Dropout (subsampling.py:69-110)
    linear_legacy: ... + ReLU (subsampling.py:338-383)
    Returns (xs, pos_emb) with pos_emb the full (1, 2T-1, D) rel-pos table.
    """
    sp = p.sub("embed")
    xs = dense(sp, "out.0", xs, ctx)
    xs = layer_norm(sp, "out.1", xs, eps=1e-5)
    xs = ctx.dropout(xs, cfg.dropout_rate)
    if cfg.input_layer == "linear_legacy":
        xs = jax.nn.relu(xs)
    T = xs.shape[1]
    d = cfg.output_size
    if xscale:
        xs = xs * jnp.asarray(d, xs.dtype) ** 0.5
    pos_emb = rel_pos_table(T, d).astype(xs.dtype)
    pos_emb = ctx.dropout(pos_emb, cfg.positional_dropout_rate)
    return xs, pos_emb


def encoder_forward(
    p: P,
    cfg: EncoderConfig,
    xs: jax.Array,  # (B, T, input_size)
    xs_lens: jax.Array,  # (B,)
    ctx: Ctx = EVAL,
    decoding_chunk_size: int = 0,
    num_decoding_left_chunks: int = -1,
    xscale: bool = True,
    conformer: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Full-sequence encoder forward (reference: encoder.py:111-170).

    Returns (xs (B, T, D), pad_mask (B, 1, T) bool).
    """
    if not conformer and decoding_chunk_size == 0:
        # GPipe dispatch: under an active pipeline_context the transformer
        # stack runs microbatch-pipelined over the mesh (parallel/pp.py);
        # returns None when no context is active or the stack is ineligible
        from ..parallel.pp import maybe_pipeline

        res = maybe_pipeline(p, cfg, xs, xs_lens, ctx, xscale,
                             num_decoding_left_chunks=num_decoding_left_chunks)
        if res is not None:
            return res

    B, T, _ = xs.shape
    pad_mask = M.make_non_pad_mask(xs_lens, T)[:, None, :]  # (B, 1, T)
    xs, pos_emb = embed_input(p, cfg, xs, ctx, xscale=xscale)
    chunk_rng = ctx.make_rng() if (cfg.use_dynamic_chunk and ctx.train) else None
    chunk_masks = M.add_optional_chunk_mask(
        T, pad_mask, cfg.use_dynamic_chunk, cfg.use_dynamic_left_chunk,
        decoding_chunk_size, cfg.static_chunk_size, num_decoding_left_chunks,
        rng=chunk_rng,
    )
    attn_bias = M.mask_to_bias(chunk_masks, xs.dtype)

    for i in range(cfg.num_blocks):
        def run(x, _p=p, _i=i):
            if conformer:
                return conformer_layer(_p, f"encoders.{_i}", cfg, x, attn_bias, pos_emb, pad_mask, ctx)
            return transformer_layer(_p, f"encoders.{_i}", cfg, x, attn_bias, pos_emb, ctx)

        if cfg.gradient_checkpointing and ctx.train:
            xs = jax.checkpoint(run)(xs)
        else:
            xs = run(xs)

    if cfg.normalize_before:
        xs = layer_norm(p, "after_norm", xs, eps=1e-5)
    return xs, pad_mask


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_encoder(kg: KeyGen, d: Params, prefix: str, cfg: EncoderConfig, conformer: bool = True):
    """Create randomly-initialized encoder params with exact torch names."""
    pre = prefix + "." if prefix else ""
    D, H = cfg.output_size, cfg.attention_heads
    init_linear(kg(), d, pre + "embed.out.0", cfg.input_size, D)
    init_norm(d, pre + "embed.out.1", D)
    init_norm(d, pre + "after_norm", D)
    for i in range(cfg.num_blocks):
        lp = f"{pre}encoders.{i}"
        for qkv in ("linear_q", "linear_k", "linear_v", "linear_out"):
            init_linear(kg(), d, f"{lp}.self_attn.{qkv}", D, D, bias=cfg.key_bias)
        init_linear(kg(), d, f"{lp}.self_attn.linear_pos", D, D, bias=False)
        # xavier_uniform for pos biases (reference: attention.py:220-223)
        import math
        bound = math.sqrt(6.0 / (H + cfg.head_dim))
        d[f"{lp}.self_attn.pos_bias_u"] = jax.random.uniform(
            kg(), (H, cfg.head_dim), jnp.float32, -bound, bound)
        d[f"{lp}.self_attn.pos_bias_v"] = jax.random.uniform(
            kg(), (H, cfg.head_dim), jnp.float32, -bound, bound)
        init_linear(kg(), d, f"{lp}.feed_forward.w_1", D, cfg.linear_units)
        init_linear(kg(), d, f"{lp}.feed_forward.w_2", cfg.linear_units, D)
        if conformer:
            init_norm(d, f"{lp}.norm_mha", D)
            init_norm(d, f"{lp}.norm_ff", D)
            if cfg.macaron_style:
                init_linear(kg(), d, f"{lp}.feed_forward_macaron.w_1", D, cfg.linear_units)
                init_linear(kg(), d, f"{lp}.feed_forward_macaron.w_2", cfg.linear_units, D)
                init_norm(d, f"{lp}.norm_ff_macaron", D)
            if cfg.use_cnn_module:
                init_conv1d(kg(), d, f"{lp}.conv_module.pointwise_conv1", D, 2 * D, 1)
                init_conv1d(kg(), d, f"{lp}.conv_module.depthwise_conv", D, D,
                            cfg.cnn_module_kernel, groups=D)
                init_conv1d(kg(), d, f"{lp}.conv_module.pointwise_conv2", D, D, 1)
                init_norm(d, f"{lp}.conv_module.norm", D)
                init_norm(d, f"{lp}.norm_conv", D)
                init_norm(d, f"{lp}.norm_final", D)
        else:
            init_norm(d, f"{lp}.norm1", D)
            init_norm(d, f"{lp}.norm2", D)
