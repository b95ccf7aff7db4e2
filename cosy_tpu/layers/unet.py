"""U-Net ConditionalDecoder — the CFM velocity estimator.

Topology and weight naming follow the Matcha-derived decoder exactly
(reference: modules.py:886-1106; stock copy cosyvoice/flow/decoder.py:88-291):

    down_blocks.i = [ResnetBlock1D, [BasicTransformerBlock]*n, Down/Conv]
    mid_blocks.i  = [ResnetBlock1D, [BasicTransformerBlock]*n]
    up_blocks.i   = [ResnetBlock1D, [BasicTransformerBlock]*n, Up/Conv]
    final_block (Block1D), final_proj (1x1 conv), time_mlp (TimestepEmbedding)

Differences from the reference implementation (behavior-preserving, TPU-first):
- prompt isolation is per-sample (a (B,) vector) instead of the batch max the
  reference collapses to (flow_model.py:164-172 notes its own simplification);
- masks/biases are precomputed per resolution level once, not per block;
- all shapes static; the time axis must be a multiple of 2 (one stride-2 level).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import EstimatorConfig
from ..ctx import Ctx, EVAL
from ..params import P, Params, KeyGen, init_linear, init_norm, init_conv1d, init_conv_transpose1d
from ..ops import masks as M
from .basic import (conv1d_nwc, conv_transpose1d_nwc, dense, gelu, layer_norm,
                    group_norm_nwc, mish, silu)
from .attention import diffusers_attention
from .posenc import timestep_embedding


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _mul_mask(x: jax.Array, mask) -> jax.Array:
    """x * mask, or x unchanged on the dense fast path (mask=None == all-valid).

    Inference over full utterances has no padding (flow_inference pads to an
    even T and strips afterwards; with even T the mask is statically all-ones),
    so the ~40 masking multiplies per estimator call are pure HBM traffic —
    callers pass mask=None to elide them."""
    return x if mask is None else x * mask


def block1d(p: P, name: str, x: jax.Array, mask, ctx: Ctx,
            causal: bool = False, frames_valid=None) -> jax.Array:
    """Conv3 + GroupNorm(8) + Mish, masked before and after (modules.py:60-73).

    Channels-last throughout: x is (B, T, C), mask (B, T, 1) or None.

    ``frames_valid`` (traced (B,)): valid-frames-only GroupNorm statistics —
    required for the length-masked serving buckets, where pad frames would
    otherwise shift the (C, T)-wide statistics (see flow.flow_inference
    token_valid).

    Causal variant (CosyVoice2): left-padded conv + LayerNorm over channels
    (state-dict index block.2) + Mish (decoder.py:65-78)."""
    sp = p.sub(name)
    if causal:
        h = jnp.pad(_mul_mask(x, mask), ((0, 0), (2, 0), (0, 0)))
        h = conv1d_nwc(sp, "block.0", h, ctx=ctx)
        h = layer_norm(sp, "block.2", h)
    else:
        h = conv1d_nwc(sp, "block.0", _mul_mask(x, mask), padding=1, ctx=ctx)
        h = group_norm_nwc(sp, "block.1", _mul_mask(h, mask), num_groups=8,
                           frames_valid=frames_valid) \
            if frames_valid is not None else \
            group_norm_nwc(sp, "block.1", h, num_groups=8)
    return _mul_mask(mish(h), mask)


def resnet_block1d(p: P, name: str, x: jax.Array, mask, t: jax.Array,
                   ctx: Ctx, causal: bool = False, frames_valid=None) -> jax.Array:
    """ResNet block with timestep conditioning (modules.py:76-94).
    Channels-last: x (B, T, C), t (B, time_embed_dim)."""
    sp = p.sub(name)
    h = block1d(sp, "block1", x, mask, ctx, causal, frames_valid)
    h = h + dense(sp, "mlp.1", mish(t), ctx)[:, None, :]
    h = block1d(sp, "block2", h, mask, ctx, causal, frames_valid)
    return h + conv1d_nwc(sp, "res_conv", _mul_mask(x, mask), ctx=ctx)


def causal_conv1d(p: P, name: str, x: jax.Array, kernel: int, ctx: Ctx) -> jax.Array:
    """Left-padded conv on (B, T, C) (decoder.py:36-62)."""
    return conv1d_nwc(p, name, jnp.pad(x, ((0, 0), (kernel - 1, 0), (0, 0))), ctx=ctx)


def feed_forward(p: P, name: str, x: jax.Array, act_fn: str, ctx: Ctx,
                 gelu_approximate: bool = True, dropout: float = 0.0) -> jax.Array:
    """diffusers FeedForward: net.0 = activation-with-proj, net.2 = Linear
    (modules.py:192-224)."""
    sp = p.sub(name)
    if act_fn in ("gelu", "gelu-approximate"):
        h = dense(sp, "net.0.proj", x, ctx)
        h = gelu(h, approximate=gelu_approximate or act_fn == "gelu-approximate")
    elif act_fn == "geglu":
        h = dense(sp, "net.0.proj", x, ctx)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * gelu(gate)
    elif act_fn in ("snakebeta", "snake"):
        h = dense(sp, "net.0.proj", x, ctx)
        alpha = jnp.exp(p[name + ".net.0.alpha"].astype(jnp.float32))
        beta = jnp.exp(p[name + ".net.0.beta"].astype(jnp.float32))
        hf = h.astype(jnp.float32)
        h = (hf + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(hf * alpha))).astype(h.dtype)
    else:
        raise ValueError(f"unknown act_fn {act_fn}")
    h = ctx.dropout(h, dropout)
    return dense(sp, "net.2", h, ctx)


def basic_transformer_block(
    p: P,
    name: str,
    x: jax.Array,  # (B, T, C)
    attn_bias: Optional[jax.Array],
    heads: int,
    act_fn: str,
    ctx: Ctx,
    gelu_approximate: bool = True,
    dropout: float = 0.0,
    window: Optional[int] = None,  # opt-in local-band attention
) -> jax.Array:
    """attn1 + ff with norm1/norm3 naming (modules.py:296-375)."""
    sp = p.sub(name)

    from ..ops.fused_block import fused_transformer_block, use_fused_block

    wq = sp.get("attn1.to_q.weight")
    w1 = sp.get("ff.net.0.proj.weight")
    if window is None and wq is not None and w1 is not None and dropout == 0.0 and use_fused_block(
            x.shape[1], x.shape[2], wq.shape[0], w1.shape[0], act_fn, ctx,
            None if attn_bias is None else attn_bias.ndim):
        # whole block in one Pallas kernel, intermediates VMEM-resident
        # (ops/fused_block.py); math identical to the XLA path below
        return fused_transformer_block(
            x, attn_bias,
            sp["norm1.weight"], sp["norm1.bias"],
            wq, sp["attn1.to_k.weight"], sp["attn1.to_v.weight"],
            sp["attn1.to_out.0.weight"], sp["attn1.to_out.0.bias"],
            sp["norm3.weight"], sp["norm3.bias"],
            w1, sp["ff.net.0.proj.bias"],
            sp["ff.net.2.weight"], sp["ff.net.2.bias"],
            heads=heads, scale=(wq.shape[0] // heads) ** -0.5,
            gelu_approximate=gelu_approximate or act_fn == "gelu-approximate",
        )

    h = layer_norm(sp, "norm1", x)
    x = x + diffusers_attention(sp, "attn1", h, attn_bias, heads, ctx, window=window)
    h = layer_norm(sp, "norm3", x)
    x = x + feed_forward(sp, "ff", h, act_fn, ctx, gelu_approximate, dropout)
    return x


# ---------------------------------------------------------------------------
# ConditionalDecoder forward
# ---------------------------------------------------------------------------


def _level_bias(
    mask: jax.Array,  # (B, T_l, 1) bool/float valid mask at this level
    T_full: int,
    prompt_lens: Optional[jax.Array],
    dtype,
) -> jax.Array:
    """(B, T_l, T_l) additive attention bias: padding + prompt isolation.

    Prompt length is rescaled to the level's resolution like the reference
    (modules.py:1034-1042: scale = seq_len / full_len, scaled = max(1, int(...))).
    """
    T_l = mask.shape[1]
    valid = mask.astype(bool)[:, :, 0]  # (B, T_l)
    bias = M.mask_to_bias(valid[:, None, :], dtype)  # (B, 1, T_l) -> broadcast over queries
    bias = jnp.broadcast_to(bias, (mask.shape[0], T_l, T_l))
    if prompt_lens is not None:
        pl = jnp.asarray(prompt_lens)
        scaled = jnp.where(pl > 0, jnp.maximum(1, (pl * T_l) // T_full), 0)
        iso = jax.vmap(lambda s: M.prompt_isolation_bias(T_l, s, dtype))(scaled)
        bias = bias + iso
    return bias


def conditional_decoder(
    p: P,
    cfg: EstimatorConfig,
    x: jax.Array,  # (B, 80, T) noisy sample
    mask,  # (B, 1, T) float valid mask, or None == all-valid (dense fast path)
    mu: jax.Array,  # (B, 80, T) encoder output
    t: jax.Array,  # (B,) timestep in [0, 1]
    spks: jax.Array,  # (B, 80)
    cond: jax.Array,  # (B, 80, T)
    ctx: Ctx = EVAL,
    prompt_lens: Optional[jax.Array] = None,  # (B,) int, 0 = no isolation
    causal: bool = False,
    streaming: bool = False,
    static_chunk_size: int = 50,
    frames_valid: Optional[jax.Array] = None,  # (B,) traced true frame counts
    s: Optional[jax.Array] = None,  # (B,) MeanFlow target time (distilled nets)
) -> jax.Array:
    """Velocity field estimate (B, 80, T) (reference: modules.py:998-1106;
    causal/streaming variant: cosyvoice/flow/decoder.py:294-494).

    mask=None is the dense fast path for full-valid batches (inference over
    exact-length utterances): masking multiplies and the (B, T, T) padding
    bias are elided entirely — the result is identical to an all-ones mask.

    Internals are channels-last (B, T, C): TPU convolutions and the
    surrounding matmuls both want features on lanes, so the NCW blocks the
    reference uses would force a relayout copy at every conv<->attention
    boundary (~128 transposes per call).  Only the public (B, 80, T)
    signature keeps the torch orientation."""
    B, _, T = x.shape
    assert T % 2 == 0, "estimator time axis must be a multiple of 2 (one stride-2 U-Net level)"
    dtype = x.dtype

    temb = timestep_embedding(t, cfg.in_channels).astype(dtype)
    sp_t = p.sub("time_mlp")
    temb = dense(sp_t, "linear_2", silu(dense(sp_t, "linear_1", temb, ctx)), ctx)
    if s is not None:
        # MeanFlow average-velocity field u(y_t, t, s): the integration
        # TARGET time enters through a second embedding branch whose output
        # projection starts at zero, so a freshly-branched student equals the
        # teacher's instantaneous field (train/distill.py)
        semb = timestep_embedding(s, cfg.in_channels).astype(dtype)
        sp_s = p.sub("time_mlp_s")
        temb = temb + dense(sp_s, "linear_2", silu(dense(sp_s, "linear_1", semb, ctx)), ctx)

    spks_t = jnp.broadcast_to(spks[:, None, :], (B, T, spks.shape[1])).astype(dtype)
    h = jnp.concatenate([x.transpose(0, 2, 1), mu.transpose(0, 2, 1),
                         spks_t, cond.transpose(0, 2, 1)], axis=-1)  # (B, T, 320)
    if mask is not None:
        mask = mask.transpose(0, 2, 1)  # (B, T, 1)

    n_levels = len(cfg.channels)
    # per-level frame counts: each stride-2 downsample (and the matching
    # [::2] mask subsampling) yields ceil(T_l / 2); the last down block is
    # stride-1 so the deepest level repeats the previous count
    level_lens = [T]
    for _ in range(n_levels - 1):
        level_lens.append(-(-level_lens[-1] // 2))
    # the dense fast path with prompt isolation still needs explicit masks
    if mask is None and prompt_lens is not None and not streaming:
        mask = jnp.ones((B, T, 1), dtype)
    if mask is None:
        level_masks = [None] * n_levels
    else:
        level_masks = [mask]
        for _ in range(n_levels - 1):
            level_masks.append(level_masks[-1][:, ::2, :])
    # per-level valid counts for masked GroupNorm statistics (the [::2] mask
    # subsampling keeps ceil(v/2) of a v-frame valid prefix)
    if frames_valid is None:
        level_valid = [None] * n_levels
    else:
        level_valid = [jnp.reshape(frames_valid, (-1,))]
        for _ in range(n_levels - 1):
            level_valid.append((level_valid[-1] + 1) // 2)
    if streaming:
        # static chunk attention at every level (decoder.py:439-443)
        def _stream_bias(m, T_l):
            chunk = M.subsequent_chunk_mask(T_l, static_chunk_size, -1)
            if m is None:
                return M.mask_to_bias(chunk[None], dtype)
            allowed = m.astype(bool)[:, :, 0][:, None, :] & chunk[None]
            dead = jnp.sum(allowed, axis=-1, keepdims=True) == 0
            return M.mask_to_bias(allowed | dead, dtype)

        level_bias = [_stream_bias(m, T_l)
                      for m, T_l in zip(level_masks, level_lens)]
    elif mask is None:
        level_bias = [None] * n_levels
    else:
        level_bias = [_level_bias(m, T, prompt_lens, dtype) for m in level_masks]

    # opt-in local-band attention (EstimatorConfig.attn_window; env override
    # COSY_TPU_ATTN_WINDOW, 0 = off).  Inference-only, dense no-bias path
    # only: training, streaming chunk masks, and prompt isolation keep full
    # attention.  The window halves with each U-Net level so the temporal
    # receptive span stays constant; a window covering the whole level is
    # normalized to None (exactly full attention).
    import os
    env_w = os.environ.get("COSY_TPU_ATTN_WINDOW")
    attn_window = (int(env_w) if env_w else cfg.attn_window)
    if not attn_window or attn_window <= 0 or ctx.train:
        level_window = [None] * n_levels
    else:
        level_window = [
            w if (level_bias[lv] is None and w < level_lens[lv]) else None
            for lv, w in enumerate(max(1, (attn_window * T_l) // T)
                                   for T_l in level_lens)
        ]

    def run_transformers(prefix, ht, lvl):
        for j in range(cfg.n_blocks):
            ht = basic_transformer_block(
                p, f"{prefix}.{j}", ht, level_bias[lvl], cfg.num_heads,
                cfg.act_fn, ctx, cfg.gelu_approximate, cfg.dropout,
                window=level_window[lvl],
            )
        return ht

    hiddens = []
    for i in range(n_levels):
        lvl = min(i, n_levels - 1)
        m = level_masks[lvl]
        h = resnet_block1d(p, f"down_blocks.{i}.0", h, m, temb, ctx, causal,
                           level_valid[lvl])
        h = run_transformers(f"down_blocks.{i}.1", h, lvl)
        hiddens.append(h)
        if i < n_levels - 1:
            h = conv1d_nwc(p, f"down_blocks.{i}.2.conv", _mul_mask(h, m), stride=2, padding=1, ctx=ctx)
        elif causal:
            h = causal_conv1d(p, f"down_blocks.{i}.2", _mul_mask(h, m), 3, ctx)
        else:
            h = conv1d_nwc(p, f"down_blocks.{i}.2", _mul_mask(h, m), padding=1, ctx=ctx)

    mid_lvl = n_levels - 1
    m = level_masks[mid_lvl]
    for i in range(cfg.num_mid_blocks):
        h = resnet_block1d(p, f"mid_blocks.{i}.0", h, m, temb, ctx, causal,
                           level_valid[mid_lvl])
        h = run_transformers(f"mid_blocks.{i}.1", h, mid_lvl)

    for i in range(n_levels):
        lvl = n_levels - 1 - i
        m = level_masks[lvl]
        skip = hiddens.pop()
        h = jnp.concatenate([h[:, : skip.shape[1], :], skip], axis=-1)
        h = resnet_block1d(p, f"up_blocks.{i}.0", h, m, temb, ctx, causal,
                           level_valid[lvl])
        h = run_transformers(f"up_blocks.{i}.1", h, lvl)
        if i < n_levels - 1:
            h = conv_transpose1d_nwc(p, f"up_blocks.{i}.2.conv", _mul_mask(h, m), stride=2, padding=1)
        elif causal:
            h = causal_conv1d(p, f"up_blocks.{i}.2", _mul_mask(h, m), 3, ctx)
        else:
            h = conv1d_nwc(p, f"up_blocks.{i}.2", _mul_mask(h, m), padding=1, ctx=ctx)

    m = level_masks[0]
    h = block1d(p, "final_block", h, m, ctx, causal, level_valid[0])
    out = conv1d_nwc(p, "final_proj", _mul_mask(h, m), ctx=ctx)
    return _mul_mask(out, mask).transpose(0, 2, 1)  # back to (B, 80, T)


# ---------------------------------------------------------------------------
# Initialization (kaiming_normal convs/linears like the reference
# modules.py:984-996; only used for tests / training from scratch)
# ---------------------------------------------------------------------------


def init_conditional_decoder(kg: KeyGen, d: Params, prefix: str, cfg: EstimatorConfig,
                             causal: bool = False):
    pre = prefix + "." if prefix else ""
    ted = cfg.time_embed_dim
    norm_idx = 2 if causal else 1  # causal blocks use LayerNorm at block.2

    init_linear(kg(), d, pre + "time_mlp.linear_1", cfg.in_channels, ted)
    init_linear(kg(), d, pre + "time_mlp.linear_2", ted, ted)

    def init_resnet(name, dim_in, dim_out):
        init_linear(kg(), d, f"{name}.mlp.1", ted, dim_out)
        init_conv1d(kg(), d, f"{name}.block1.block.0", dim_in, dim_out, 3)
        init_norm(d, f"{name}.block1.block.{norm_idx}", dim_out)
        init_conv1d(kg(), d, f"{name}.block2.block.0", dim_out, dim_out, 3)
        init_norm(d, f"{name}.block2.block.{norm_idx}", dim_out)
        init_conv1d(kg(), d, f"{name}.res_conv", dim_in, dim_out, 1)

    def init_tblock(name, dim):
        inner = cfg.num_heads * cfg.attention_head_dim
        init_norm(d, f"{name}.norm1", dim)
        init_norm(d, f"{name}.norm3", dim)
        for qkv in ("to_q", "to_k", "to_v"):
            init_linear(kg(), d, f"{name}.attn1.{qkv}", dim, inner, bias=False)
        init_linear(kg(), d, f"{name}.attn1.to_out.0", inner, dim)
        ff_inner = dim * 4
        if cfg.act_fn == "geglu":
            init_linear(kg(), d, f"{name}.ff.net.0.proj", dim, ff_inner * 2)
        else:
            init_linear(kg(), d, f"{name}.ff.net.0.proj", dim, ff_inner)
            if cfg.act_fn in ("snakebeta", "snake"):
                d[f"{name}.ff.net.0.alpha"] = jnp.zeros((ff_inner,), jnp.float32)
                d[f"{name}.ff.net.0.beta"] = jnp.zeros((ff_inner,), jnp.float32)
        init_linear(kg(), d, f"{name}.ff.net.2", ff_inner, dim)

    n_levels = len(cfg.channels)
    out_ch = cfg.in_channels
    for i in range(n_levels):
        in_ch, out_ch = out_ch, cfg.channels[i]
        init_resnet(f"{pre}down_blocks.{i}.0", in_ch, out_ch)
        for j in range(cfg.n_blocks):
            init_tblock(f"{pre}down_blocks.{i}.1.{j}", out_ch)
        if i < n_levels - 1:
            init_conv1d(kg(), d, f"{pre}down_blocks.{i}.2.conv", out_ch, out_ch, 3)
        else:
            init_conv1d(kg(), d, f"{pre}down_blocks.{i}.2", out_ch, out_ch, 3)

    for i in range(cfg.num_mid_blocks):
        init_resnet(f"{pre}mid_blocks.{i}.0", cfg.channels[-1], cfg.channels[-1])
        for j in range(cfg.n_blocks):
            init_tblock(f"{pre}mid_blocks.{i}.1.{j}", cfg.channels[-1])

    rev = tuple(reversed(cfg.channels)) + (cfg.channels[0],)
    for i in range(len(rev) - 1):
        in_ch, out_ch = rev[i] * 2, rev[i + 1]
        init_resnet(f"{pre}up_blocks.{i}.0", in_ch, out_ch)
        for j in range(cfg.n_blocks):
            init_tblock(f"{pre}up_blocks.{i}.1.{j}", out_ch)
        if i < len(rev) - 2:
            init_conv_transpose1d(kg(), d, f"{pre}up_blocks.{i}.2.conv", out_ch, out_ch, 4)
        else:
            init_conv1d(kg(), d, f"{pre}up_blocks.{i}.2", out_ch, out_ch, 3)

    init_conv1d(kg(), d, f"{pre}final_block.block.0", rev[-1], rev[-1], 3)
    init_norm(d, f"{pre}final_block.block.{norm_idx}", rev[-1])
    init_conv1d(kg(), d, f"{pre}final_proj", rev[-1], cfg.out_channels, 1)
