"""UpsampleConformerEncoder — CosyVoice2's flow encoder.

Reference behavior: cosyvoice/transformer/upsample_encoder.py: a token-rate
conformer stack behind a PreLookaheadLayer (3-token lookahead), a x2
nearest-neighbor + causal-conv upsampler, and a mel-rate conformer stack;
streaming uses static chunk masks (25 at token rate, 50 after upsampling).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import EncoderConfig
from ..ctx import Ctx, EVAL
from ..params import P, Params, KeyGen, init_linear, init_norm, init_conv1d
from ..ops import masks as M
from .basic import conv1d, dense, layer_norm, leaky_relu
from .conformer import conformer_layer, embed_input, init_encoder
from .posenc import rel_pos_table


def pre_lookahead(p: P, x: jax.Array, pre_len: int, ctx: Ctx,
                  context: Optional[jax.Array] = None) -> jax.Array:
    """(B, T, C): lookahead conv (right pad / context) + causal conv + residual
    (upsample_encoder.py:66-102)."""
    h = x.transpose(0, 2, 1)  # (B, C, T)
    if context is None or context.shape[1] == 0:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, pre_len)))
    else:
        hc = context.transpose(0, 2, 1)
        h = jnp.concatenate([h, hc], axis=2)
        h = jnp.pad(h, ((0, 0), (0, 0), (0, pre_len - hc.shape[2])))
    h = leaky_relu(conv1d(p, "conv1", h, ctx=ctx))  # k = pre_len+1, valid
    h = jnp.pad(h, ((0, 0), (0, 0), (2, 0)))
    h = conv1d(p, "conv2", h, ctx=ctx)  # k=3 causal
    return h.transpose(0, 2, 1) + x


def upsample1d(p: P, x: jax.Array, stride: int, ctx: Ctx) -> jax.Array:
    """(B, C, T) -> (B, C, T*stride): nearest x stride, left pad 2*stride,
    conv k=2*stride+1 (upsample_encoder.py:37-63)."""
    B, C, T = x.shape
    h = jnp.repeat(x, stride, axis=2)
    h = jnp.pad(h, ((0, 0), (0, 0), (stride * 2, 0)))
    return conv1d(p, "conv", h, ctx=ctx)


def upsample_encoder_forward(
    p: P,
    cfg: EncoderConfig,  # token-rate stack config (output_size 512 etc.)
    xs: jax.Array,  # (B, T, input_size)
    xs_lens: jax.Array,
    ctx: Ctx = EVAL,
    streaming: bool = False,
    context: Optional[jax.Array] = None,  # (B, pre_len, input_size) raw tokens' embeddings
    num_up_blocks: int = 4,
    up_stride: int = 2,
    pre_lookahead_len: int = 3,
    token_chunk_size: int = 25,
    mask_pads_exact: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (xs (B, T*stride, D), pad_mask at token rate).

    ``mask_pads_exact``: the length-masked serving buckets (see
    flow2_inference token_valid) need pad positions re-zeroed after the
    embed projection and the lookahead layer — both are bias-producing, and
    the lookahead conv looks RIGHT into the pad region, so a bucket-padded
    input would otherwise differ from the unpadded program near the valid
    boundary.  Off for training: the reference feeds padded batches through
    these layers unmasked, and parity requires matching that."""
    B, T, _ = xs.shape
    pad_mask = M.make_non_pad_mask(xs_lens, T)[:, None, :]
    xs, pos_emb = embed_input(p, cfg, xs, ctx, xscale=True)
    if mask_pads_exact:
        xs = xs * pad_mask.transpose(0, 2, 1).astype(xs.dtype)
    ctx_emb = None
    if context is not None and context.shape[1] != 0:
        c, _ = embed_input(p, cfg, context, ctx, xscale=True)
        ctx_emb = c
    chunk = token_chunk_size if streaming else 0
    chunk_masks = M.add_optional_chunk_mask(T, pad_mask, False, False, 0, chunk, -1)
    attn_bias = M.mask_to_bias(chunk_masks, xs.dtype)

    xs = pre_lookahead(p.sub("pre_lookahead_layer"), xs, pre_lookahead_len, ctx, ctx_emb)
    if mask_pads_exact:
        xs = xs * pad_mask.transpose(0, 2, 1).astype(xs.dtype)
    for i in range(cfg.num_blocks):
        xs = conformer_layer(p, f"encoders.{i}", cfg, xs, attn_bias, pos_emb, pad_mask, ctx)

    # upsample to mel rate
    xs = upsample1d(p.sub("up_layer"), xs.transpose(0, 2, 1), up_stride, ctx).transpose(0, 2, 1)
    up_lens = xs_lens * up_stride
    T2 = xs.shape[1]
    pad_mask2 = M.make_non_pad_mask(up_lens, T2)[:, None, :]

    # second input projection + PE ("up_embed")
    sp = p.sub("up_embed")
    xs = dense(sp, "out.0", xs, ctx)
    xs = layer_norm(sp, "out.1", xs, eps=1e-5)
    xs = ctx.dropout(xs, cfg.dropout_rate)
    xs = xs * jnp.asarray(cfg.output_size, xs.dtype) ** 0.5
    pos_emb2 = rel_pos_table(T2, cfg.output_size).astype(xs.dtype)

    chunk2 = token_chunk_size * up_stride if streaming else 0
    chunk_masks2 = M.add_optional_chunk_mask(T2, pad_mask2, False, False, 0, chunk2, -1)
    attn_bias2 = M.mask_to_bias(chunk_masks2, xs.dtype)
    for i in range(num_up_blocks):
        xs = conformer_layer(p, f"up_encoders.{i}", cfg, xs, attn_bias2, pos_emb2, pad_mask2, ctx)

    if cfg.normalize_before:
        xs = layer_norm(p, "after_norm", xs, eps=1e-5)
    return xs, pad_mask2


def init_upsample_encoder(kg: KeyGen, d: Params, prefix: str, cfg: EncoderConfig,
                          num_up_blocks: int = 4, pre_lookahead_len: int = 3,
                          up_stride: int = 2):
    pre = prefix + "." if prefix else ""
    D = cfg.output_size
    # the reference builds up_embed with fan-in input_size while the forward
    # feeds it the up_layer's output_size channels (reference
    # upsample_encoder.py:217-224) — coherent only when the two match, as in
    # every shipped CosyVoice2 config; fail loudly instead of initializing a
    # weight the forward cannot use
    assert cfg.input_size == cfg.output_size, (
        "UpsampleConformerEncoder requires input_size == output_size "
        f"(got {cfg.input_size} vs {cfg.output_size}); the reference has the "
        "same latent constraint")
    # token-rate stack (embed, encoders.N, after_norm) via the shared initializer
    init_encoder(kg, d, prefix, cfg, conformer=True)
    init_conv1d(kg(), d, pre + "pre_lookahead_layer.conv1", D, D, pre_lookahead_len + 1)
    init_conv1d(kg(), d, pre + "pre_lookahead_layer.conv2", D, D, 3)
    init_conv1d(kg(), d, pre + "up_layer.conv", D, D, up_stride * 2 + 1)
    init_linear(kg(), d, pre + "up_embed.out.0", cfg.input_size, D)
    init_norm(d, pre + "up_embed.out.1", D)
    for i in range(num_up_blocks):
        lp = f"{pre}up_encoders.{i}"
        for qkv in ("linear_q", "linear_k", "linear_v", "linear_out"):
            init_linear(kg(), d, f"{lp}.self_attn.{qkv}", D, D)
        init_linear(kg(), d, f"{lp}.self_attn.linear_pos", D, D, bias=False)
        import math
        bound = math.sqrt(6.0 / (cfg.attention_heads + cfg.head_dim))
        d[f"{lp}.self_attn.pos_bias_u"] = jax.random.uniform(
            kg(), (cfg.attention_heads, cfg.head_dim), jnp.float32, -bound, bound)
        d[f"{lp}.self_attn.pos_bias_v"] = jax.random.uniform(
            kg(), (cfg.attention_heads, cfg.head_dim), jnp.float32, -bound, bound)
        init_linear(kg(), d, f"{lp}.feed_forward.w_1", D, cfg.linear_units)
        init_linear(kg(), d, f"{lp}.feed_forward.w_2", cfg.linear_units, D)
        init_norm(d, f"{lp}.norm_mha", D)
        init_norm(d, f"{lp}.norm_ff", D)
