"""Primitive layers over flat torch-layout param dicts.

All functions take a ``P`` view and a relative module name, read
``name + ".weight"`` / ``name + ".bias"``, and apply the op with torch
semantics.  LoRA adapters are consulted transparently: if the active
``Ctx.lora`` dict contains ``<full key>.lora_A`` / ``.lora_B`` the low-rank
delta ``(x @ A^T) @ B^T * scale`` is added (reference: lora.py:18-131).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ctx import Ctx, EVAL
from ..params import P


# ---------------------------------------------------------------------------
# Linear / embedding
# ---------------------------------------------------------------------------


def _lora_delta(ctx: Ctx, full_name: str, x: jax.Array) -> Optional[jax.Array]:
    if ctx.lora is None:
        return None
    a = ctx.lora.get(full_name + ".lora_A")
    if a is None:
        return None
    b = ctx.lora[full_name + ".lora_B"]
    xd = ctx.dropout(x, ctx.lora_dropout)
    if a.ndim == 3:
        # voice-stacked adapters (V, r, in)/(V, out, r): route each batch
        # row (x leading axis) through its own voice's delta — multi-voice
        # LoRA serving (the reference's vLLM plugin declares SupportsLoRA,
        # cosyvoice/vllm/cosyvoice2.py:29; this is the TPU-native mechanism)
        vids = ctx.lora_vids
        if vids is None:
            raise ValueError(
                f"stacked LoRA adapters for {full_name} need Ctx.lora_vids")
        a_sel = jnp.take(a, vids, axis=0).astype(x.dtype)  # (B, r, in)
        b_sel = jnp.take(b, vids, axis=0).astype(x.dtype)  # (B, out, r)
        h = jnp.einsum("b...i,bri->b...r", xd, a_sel)
        return jnp.einsum("b...r,bor->b...o", h, b_sel) * ctx.lora_scale
    h = jnp.einsum("...i,ri->...r", xd, a.astype(x.dtype))
    return jnp.einsum("...r,or->...o", h, b.astype(x.dtype)) * ctx.lora_scale


def dense(p: P, name: str, x: jax.Array, ctx: Ctx = EVAL) -> jax.Array:
    """torch nn.Linear: weight (out, in), y = x @ W^T + b, plus LoRA delta.

    int8 weight-only quantization (quant.quantize_int8) is transparent: an
    int8 weight with a ``.weight@scale`` sibling dequantizes per output
    channel after the matmul — the convert fuses into the dot, so weight HBM
    traffic halves (the bound on bs=1 decode, PERF.md)."""
    w = p[name + ".weight"]
    y = jnp.einsum("...i,oi->...o", x, w.astype(x.dtype))
    if w.dtype == jnp.int8:
        y = y * p[name + ".weight@scale"].astype(x.dtype)
    b = p.get(name + ".bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    delta = _lora_delta(ctx, p.full(name), x)
    if delta is not None:
        y = y + delta
    return y


def embedding(p: P, name: str, ids: jax.Array, clamp_min: Optional[int] = None) -> jax.Array:
    w = p[name + ".weight"]
    if clamp_min is not None:
        ids = jnp.maximum(ids, clamp_min)
    return jnp.take(w, ids, axis=0)


# ---------------------------------------------------------------------------
# Convolutions (channel-first, torch layouts)
# ---------------------------------------------------------------------------


def _conv1x1_lora_delta(ctx: Ctx, full_name: str, x: jax.Array,
                        layout: str) -> Optional[jax.Array]:
    """LoRA delta for a 1x1 conv (reference: lora.py:79-131); adapters are
    stored as (r, in, 1)/(out, r, 1) conv kernels, voice-stacked with a
    leading V axis for multi-voice routing.  ``layout`` is "bct" (NCW) or
    "btc" (NWC) — the single routing rule serves both conv layouts (and
    mirrors _lora_delta's dense rule)."""
    a = ctx.lora.get(full_name + ".lora_A.weight")
    if a is None:
        return None
    bb = ctx.lora[full_name + ".lora_B.weight"]
    xd = ctx.dropout(x, ctx.lora_dropout)
    if layout == "bct":
        hs, os, hs1, os1 = ("bct,brc->brt", "brt,bor->bot",
                            "bct,rc->brt", "brt,or->bot")
    else:
        hs, os, hs1, os1 = ("btc,brc->btr", "btr,bor->bto",
                            "btc,rc->btr", "btr,or->bto")
    if a.ndim == 4:  # voice-stacked (V, r, in, 1): per-row routing
        vids = ctx.lora_vids
        if vids is None:
            raise ValueError(
                f"stacked LoRA adapters for {full_name} need Ctx.lora_vids")
        a_sel = jnp.take(a[..., 0], vids, axis=0).astype(x.dtype)
        b_sel = jnp.take(bb[..., 0], vids, axis=0).astype(x.dtype)
        h = jnp.einsum(hs, xd, a_sel)
        return jnp.einsum(os, h, b_sel) * ctx.lora_scale
    h = jnp.einsum(hs1, xd, a[:, :, 0].astype(x.dtype))
    return jnp.einsum(os1, h, bb[:, :, 0].astype(x.dtype)) * ctx.lora_scale


def _weight(p: P, name: str, dtype) -> jax.Array:
    """Fetch a conv/linear weight, computing the weight-norm parameterization
    w = g * v / ||v|| on the fly when the params store g/v factors (training
    with weight_norm, as the reference HiFT/discriminators do)."""
    w = p.get(name + ".weight")
    if w is not None:
        return w.astype(dtype)
    g = p[name + ".weight_g"]
    v = p[name + ".weight_v"]
    axes = tuple(range(1, v.ndim))
    norm = jnp.sqrt(jnp.sum(jnp.square(v.astype(jnp.float32)), axis=axes, keepdims=True))
    return (g * v / jnp.maximum(norm, 1e-12)).astype(dtype)


def conv1d(
    p: P,
    name: str,
    x: jax.Array,  # (B, C, T)
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    ctx: Ctx = EVAL,
) -> jax.Array:
    """torch nn.Conv1d: weight (out, in/groups, k)."""
    w = _weight(p, name, x.dtype)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    b = p.get(name + ".bias")
    if b is not None:
        y = y + b.astype(x.dtype)[None, :, None]
    if ctx.lora is not None and w.shape[-1] == 1 and groups == 1:
        delta = _conv1x1_lora_delta(ctx, p.full(name), x, "bct")
        if delta is not None:
            y = y + delta
    return y


def conv1d_nwc(
    p: P,
    name: str,
    x: jax.Array,  # (B, T, C) — channels-last (TPU-native layout)
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    ctx: Ctx = EVAL,
) -> jax.Array:
    """torch nn.Conv1d semantics on a channels-last activation.

    Weights stay in the torch (out, in/groups, k) layout — the kernel
    dimension-numbers string carries the layout, no transpose materializes.
    Channels-last keeps the feature axis on lanes end-to-end, which is the
    layout TPU convolutions and the surrounding matmuls natively want; the
    NCW variant forces XLA to insert relayout copies around every conv."""
    w = _weight(p, name, x.dtype)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "OIH", "NHC"),
        feature_group_count=groups,
    )
    b = p.get(name + ".bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    if ctx.lora is not None and w.shape[-1] == 1 and groups == 1:
        delta = _conv1x1_lora_delta(ctx, p.full(name), x, "btc")
        if delta is not None:
            y = y + delta
    return y


def conv1d_gemm(
    p: P,
    name: str,
    x: jax.Array,  # (B, C, T)
    padding: int = 0,
    dilation: int = 1,
    ctx: Ctx = EVAL,  # accepted for call-site symmetry; HiFT has no LoRA
) -> jax.Array:
    """Stride-1, groups-1 nn.Conv1d expressed as an explicit im2col GEMM:
    k dilation-shifted views of the input stacked and contracted with the
    (out, in, k) kernel in ONE einsum — an (T, k*C) x (k*C, out) matmul the
    MXU tiles directly.  XLA's native conv lowering sustains only
    ~15 TFLOP/s on HiFT's dilated C=128-512 resblock stacks (PERF.md);
    this trades k-fold activation reads (HBM) for MXU-shaped flops.
    Opt-in via HiFTConfig.gemm_convs / COSY_TPU_HIFT_GEMM until the
    on-chip A/B decides the default (tools/probe_hift_gemm.py)."""
    w = _weight(p, name, x.dtype)  # (O, C, k)
    k = int(w.shape[-1])
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    t_out = xp.shape[-1] - (k - 1) * dilation
    taps = jnp.stack([xp[:, :, i * dilation: i * dilation + t_out]
                      for i in range(k)], axis=0)  # (k, B, C, T)
    y = jnp.einsum("kbct,ock->bot", taps, w)
    b = p.get(name + ".bias")
    if b is not None:
        y = y + b.astype(x.dtype)[None, :, None]
    return y


def conv_transpose1d_nwc(
    p: P,
    name: str,
    x: jax.Array,  # (B, T, C)
    stride: int,
    padding: int = 0,
) -> jax.Array:
    """torch nn.ConvTranspose1d on a channels-last activation (see
    conv_transpose1d for the fractionally-strided formulation)."""
    w = _weight(p, name, x.dtype)  # (in, out, k)
    k = w.shape[-1]
    w_t = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (out, in, k)
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x,
        w_t,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "OIH", "NHC"),
    )
    b = p.get(name + ".bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def conv_transpose1d(
    p: P,
    name: str,
    x: jax.Array,  # (B, C, T)
    stride: int,
    padding: int = 0,
) -> jax.Array:
    """torch nn.ConvTranspose1d: weight (in, out, k).

    Implemented as an input-dilated convolution with the flipped, transposed
    kernel — the standard fractionally-strided formulation, which XLA fuses
    onto the MXU just like a forward conv.
    """
    w = _weight(p, name, x.dtype)  # (in, out, k)
    k = w.shape[-1]
    w_t = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (out, in, k)
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x,
        w_t,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    b = p.get(name + ".bias")
    if b is not None:
        y = y + b.astype(x.dtype)[None, :, None]
    return y


def conv2d(
    p: P,
    name: str,
    x: jax.Array,  # (B, C, H, W)
    stride=(1, 1),
    padding=(0, 0),
    ctx: Ctx = EVAL,
) -> jax.Array:
    """torch nn.Conv2d: weight (out, in, kh, kw) — used by the GAN
    discriminators."""
    w = _weight(p, name, x.dtype)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=tuple(stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    b = p.get(name + ".bias")
    if b is not None:
        y = y + b.astype(x.dtype)[None, :, None, None]
    return y


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def layer_norm(p: P, name: str, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last dim; statistics in fp32 for bf16 stability."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * p[name + ".weight"].astype(jnp.float32) + p[name + ".bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm(p: P, name: str, x: jax.Array, num_groups: int, eps: float = 1e-5,
               frames_valid=None) -> jax.Array:
    """torch nn.GroupNorm over (B, C, T).

    ``frames_valid`` (traced (B,) or scalar): statistics over the first
    ``frames_valid`` frames only — the bucket-padded serving programs must
    reproduce the unpadded computation exactly, and GroupNorm reduces over T
    (pad frames would shift mean/var).  Requires x already zeroed beyond the
    valid region; pad frames of the OUTPUT are not re-zeroed (callers
    re-mask)."""
    B, C, T = x.shape
    xf = x.astype(jnp.float32).reshape(B, num_groups, C // num_groups, T)
    if frames_valid is None:
        mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(2, 3), keepdims=True)
    else:
        n = (jnp.reshape(frames_valid, (-1, 1, 1, 1)).astype(jnp.float32)
             * (C // num_groups))
        mean = jnp.sum(xf, axis=(2, 3), keepdims=True) / n
        # E[x^2] - mean^2 over the valid region (x is zero beyond it, so the
        # plain sum of squares is already the valid-region sum)
        var = jnp.sum(jnp.square(xf), axis=(2, 3), keepdims=True) / n - jnp.square(mean)
    y = ((xf - mean) * lax.rsqrt(var + eps)).reshape(B, C, T)
    y = y * p[name + ".weight"].astype(jnp.float32)[None, :, None]
    y = y + p[name + ".bias"].astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype)


def group_norm_nwc(p: P, name: str, x: jax.Array, num_groups: int, eps: float = 1e-5,
                   frames_valid=None) -> jax.Array:
    """torch nn.GroupNorm semantics on a channels-last (B, T, C) activation.

    torch groups channels contiguously: group g covers channels
    [g*C/G, (g+1)*C/G); statistics reduce over (T, group channels).

    ``frames_valid`` (traced (B,) or scalar): valid-frames-only statistics for
    bucket-padded inputs (see group_norm); x must already be zero beyond the
    valid frames, and callers re-mask the output."""
    B, T, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, T, num_groups, C // num_groups)
    if frames_valid is not None:
        n = (jnp.reshape(frames_valid, (-1, 1, 1, 1)).astype(jnp.float32)
             * (C // num_groups))
        mean = jnp.sum(xf, axis=(1, 3), keepdims=True) / n
        var = jnp.sum(jnp.square(xf), axis=(1, 3), keepdims=True) / n - jnp.square(mean)
    else:
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = ((xf - mean) * lax.rsqrt(var + eps)).reshape(B, T, C)
    y = y * p[name + ".weight"].astype(jnp.float32)
    y = y + p[name + ".bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def gelu(x: jax.Array, approximate: bool = False) -> jax.Array:
    return jax.nn.gelu(x, approximate=approximate)


def glu(x: jax.Array, axis: int) -> jax.Array:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def leaky_relu(x: jax.Array, slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


def snake(x: jax.Array, alpha: jax.Array, alpha_logscale: bool = False) -> jax.Array:
    """Snake activation x + 1/a * sin^2(a x) (reference: transformer/activation.py Snake).

    ``alpha`` has shape (C,) and broadcasts over (B, C, T).
    """
    a = jnp.exp(alpha) if alpha_logscale else alpha
    a = a[None, :, None]
    return x + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(x * a))


ACT = {
    "relu": jax.nn.relu,
    "swish": silu,
    "silu": silu,
    "gelu": gelu,
    "mish": mish,
    "tanh": jnp.tanh,
}
