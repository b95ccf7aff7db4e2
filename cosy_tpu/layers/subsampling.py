"""Convolutional subsampling front-ends (off-path registry variants).

Reference: cosyvoice/transformer/subsampling.py — the COSYVOICE_SUBSAMPLE
registry (class_utils.py:41-74).  The TTS paths only use the linear variants
(implemented in layers/conformer.embed_input); these conv variants exist for
ASR-style configs.  Weight names follow the torch modules exactly
(``conv.0/conv.2/conv.4`` + ``out.0``/``linear``) so real checkpoints load.

All functions take (B, T, idim) and a (B, 1, T) mask and return
(x', mask') with x' ready for a positional encoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ctx import Ctx, EVAL
from ..params import P, KeyGen
from .basic import conv1d, conv2d, dense


def conv1d_subsampling2(p: P, x: jax.Array, mask: jax.Array, ctx: Ctx = EVAL):
    """Conv1dSubsampling2 (subsampling.py:116-171): k3p1 -> GELU -> k3s2p1 ->
    GELU; rate 2, right context 4."""
    T = x.shape[1]
    h = x.transpose(0, 2, 1)
    h = jax.nn.gelu(conv1d(p, "conv.0", h, padding=1), approximate=False)
    h = jax.nn.gelu(conv1d(p, "conv.2", h, stride=2, padding=1), approximate=False)
    return h.transpose(0, 2, 1), mask[:, :, (T + 1) % 2::2]


def conv2d_subsampling4(p: P, x: jax.Array, mask: jax.Array, ctx: Ctx = EVAL):
    """Conv2dSubsampling4 (subsampling.py:173-228): two k3s2 Conv2d+ReLU over
    (1, T, idim), flattened through a Linear; rate 4, right context 6."""
    h = x[:, None]  # (B, 1, T, F)
    h = jax.nn.relu(conv2d(p, "conv.0", h, stride=(2, 2)))
    h = jax.nn.relu(conv2d(p, "conv.2", h, stride=(2, 2)))
    b, c, t, f = h.shape
    h = dense(p, "out.0", h.transpose(0, 2, 1, 3).reshape(b, t, c * f), ctx)
    return h, mask[:, :, 2::2][:, :, 2::2]


def conv2d_subsampling6(p: P, x: jax.Array, mask: jax.Array, ctx: Ctx = EVAL):
    """Conv2dSubsampling6 (subsampling.py:230-280): k3s2 then k5s3; rate 6,
    right context 10."""
    h = x[:, None]
    h = jax.nn.relu(conv2d(p, "conv.0", h, stride=(2, 2)))
    h = jax.nn.relu(conv2d(p, "conv.2", h, stride=(3, 3)))
    b, c, t, f = h.shape
    h = dense(p, "linear", h.transpose(0, 2, 1, 3).reshape(b, t, c * f), ctx)
    return h, mask[:, :, 2::2][:, :, 4::3]


def conv2d_subsampling8(p: P, x: jax.Array, mask: jax.Array, ctx: Ctx = EVAL):
    """Conv2dSubsampling8 (subsampling.py:282-336): three k3s2; rate 8,
    right context 14."""
    h = x[:, None]
    h = jax.nn.relu(conv2d(p, "conv.0", h, stride=(2, 2)))
    h = jax.nn.relu(conv2d(p, "conv.2", h, stride=(2, 2)))
    h = jax.nn.relu(conv2d(p, "conv.4", h, stride=(2, 2)))
    b, c, t, f = h.shape
    h = dense(p, "linear", h.transpose(0, 2, 1, 3).reshape(b, t, c * f), ctx)
    return h, mask[:, :, 2::2][:, :, 2::2][:, :, 2::2]


SUBSAMPLE_RATES = {
    "conv1d2": (conv1d_subsampling2, 2, 4),
    "conv2d": (conv2d_subsampling4, 4, 6),
    "conv2d6": (conv2d_subsampling6, 6, 10),
    "conv2d8": (conv2d_subsampling8, 8, 14),
}


def init_conv_subsampling(kg: KeyGen, params: dict, prefix: str, kind: str,
                          idim: int, odim: int) -> None:
    """Random init with the exact torch parameter names/shapes."""
    def add(name, shape, fan_in):
        bound = 1.0 / jnp.sqrt(fan_in)
        params[prefix + name + ".weight"] = jax.random.uniform(
            kg(), shape, jnp.float32, -bound, bound)
        params[prefix + name + ".bias"] = jax.random.uniform(
            kg(), (shape[0],), jnp.float32, -bound, bound)

    if kind == "conv1d2":
        add("conv.0", (odim, idim, 3), idim * 3)
        add("conv.2", (odim, odim, 3), odim * 3)
    elif kind == "conv2d":
        add("conv.0", (odim, 1, 3, 3), 9)
        add("conv.2", (odim, odim, 3, 3), odim * 9)
        f = ((idim - 1) // 2 - 1) // 2
        add("out.0", (odim, odim * f), odim * f)
    elif kind == "conv2d6":
        add("conv.0", (odim, 1, 3, 3), 9)
        add("conv.2", (odim, odim, 5, 5), odim * 25)
        f = ((idim - 1) // 2 - 2) // 3
        add("linear", (odim, odim * f), odim * f)
    elif kind == "conv2d8":
        add("conv.0", (odim, 1, 3, 3), 9)
        add("conv.2", (odim, odim, 3, 3), odim * 9)
        add("conv.4", (odim, odim, 3, 3), odim * 9)
        f = (((idim - 1) // 2 - 1) // 2 - 1) // 2
        add("linear", (odim, odim * f), odim * f)
    else:
        raise ValueError(kind)
