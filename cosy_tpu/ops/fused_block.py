"""Fused estimator transformer block — one Pallas kernel per block apply.

PERF.md's cost decomposition shows the CFM estimator spends ~90% of a call
in its 64 diffusers transformer-block applications at ~64 us each — about
4 TFLOP/s, an order of magnitude under the MXU — because each block lowers
to dozens of small XLA kernels with HBM round-trips between them.  This
kernel runs the WHOLE block (norm1 -> attn1 -> residual -> norm3 -> GELU ff
-> residual; modules.py:296-375 semantics, exactly the math of
layers/unet.basic_transformer_block) per (batch) grid step with every
intermediate resident in VMEM: 12 MXU matmuls back-to-back, f32 statistics
and softmax, bf16 passes.

Inference-only (no dropout, no LoRA delta): the gate in
``use_fused_block`` keeps training and adapter paths on XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG = -1e10


def _ln(xf, w, b, eps=1e-5):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _make_kernel(heads: int, scale: float, with_bias: bool,
                 gelu_approximate: bool, compute_dtype):
    def kernel(*refs):
        if with_bias:
            (x_ref, bias_ref, n1w, n1b, wq, wk, wv, wo, bo, n3w, n3b,
             w1, b1, w2, b2, o_ref) = refs
        else:
            (x_ref, n1w, n1b, wq, wk, wv, wo, bo, n3w, n3b,
             w1, b1, w2, b2, o_ref) = refs
            bias_ref = None
        cd = compute_dtype
        x = x_ref[0]
        T = x.shape[0]
        dh = wq.shape[0] // heads

        h = _ln(x.astype(jnp.float32), n1w[:].astype(jnp.float32),
                n1b[:].astype(jnp.float32)).astype(cd)
        q = jax.lax.dot_general(h, wq[:].astype(cd), (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(cd)
        k = jax.lax.dot_general(h, wk[:].astype(cd), (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(cd)
        v = jax.lax.dot_general(h, wv[:].astype(cd), (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(cd)

        outs = []
        for hd in range(heads):
            sl = slice(hd * dh, (hd + 1) * dh)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if bias_ref is not None:
                s = s + bias_ref[0].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(cd), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append((o / jnp.maximum(l, 1e-30)).astype(cd))
        attn = jnp.concatenate(outs, axis=-1)  # (T, I)
        attn = jax.lax.dot_general(attn, wo[:].astype(cd), (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32) \
            + bo[:].astype(jnp.float32)
        x1 = x.astype(jnp.float32) + attn

        h2 = _ln(x1, n3w[:].astype(jnp.float32), n3b[:].astype(jnp.float32)).astype(cd)
        f = jax.lax.dot_general(h2, w1[:].astype(cd), (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) \
            + b1[:].astype(jnp.float32)
        f = jax.nn.gelu(f, approximate=gelu_approximate).astype(cd)
        y = jax.lax.dot_general(f, w2[:].astype(cd), (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) \
            + b2[:].astype(jnp.float32)
        o_ref[0] = (x1 + y).astype(o_ref.dtype)
        del T

    return kernel


@functools.partial(jax.jit, static_argnames=("heads", "scale",
                                             "gelu_approximate", "interpret"))
def fused_transformer_block(
    x: jax.Array,                  # (B, T, C)
    bias: Optional[jax.Array],     # (B, T, T) additive or None
    n1w, n1b, wq, wk, wv, wo, bo, n3w, n3b, w1, b1, w2, b2,
    heads: int,
    scale: float,
    gelu_approximate: bool = True,
    interpret: bool = False,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = x.shape
    I = wq.shape[0]
    F = w1.shape[0]
    compute_dtype = x.dtype
    kernel = _make_kernel(heads, scale, bias is not None,
                          gelu_approximate, compute_dtype)

    def rep(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, T, T), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    weights = [n1w, n1b, wq, wk, wv, wo, bo, n3w, n3b, w1, b1, w2, b2]
    in_specs += [rep(w.shape) for w in weights]
    args += weights

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (3 * C * I + I * C + 2 * heads * T *
                               (I // heads) + 2 * C * F),
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + sum(w.size * w.dtype.itemsize for w in weights) * B,
            transcendentals=B * heads * T * T + B * T * F,
        ),
    )(*args)


def use_fused_block(T: int, C: int, inner: int, ff_inner: int, act_fn: str,
                    ctx, bias_ndim: Optional[int]) -> bool:
    """Route basic_transformer_block through the fused kernel when it is the
    measured win: inference (no dropout/LoRA), gelu activation, lane-aligned
    dims, T small enough that all intermediates fit VMEM.  COSY_TPU_FUSED_BLOCK=0
    forces off; the band's upper edge is COSY_TPU_FUSED_MAX_T (TPU only —
    the Mosaic kernel cannot lower elsewhere)."""
    import os

    env = os.environ.get("COSY_TPU_FUSED_BLOCK", "")
    if env == "0":
        return False
    if ctx.train or ctx.lora is not None:
        return False
    if act_fn not in ("gelu", "gelu-approximate"):
        return False
    if bias_ndim not in (None, 3):
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False
    # Measured-win band 384 <= T <= 512 (whole-solve A/B, tools/probe_fused.py:
    # T512 1.10x, T384 1.05x, T256 0.98x — XLA keeps short sequences).
    # T=1024 needs ~31 MB VMEM > the 16 MB limit (measured OOM, PERF.md);
    # that regime is covered by the one-tile flash-attention kernel instead
    # (ops/flash_attention.use_flash).  COSY_TPU_FUSED_MAX_T overrides just
    # the band's upper edge (band-extension probes, tools/probe_fused.py).
    max_t = int(os.environ.get("COSY_TPU_FUSED_MAX_T", "512"))
    shape_ok = (C % 128 == 0 and inner % 128 == 0 and ff_inner % 128 == 0
                and T % 8 == 0 and 384 <= T <= max_t)
    # the kernel lowers on TPU only (Mosaic): forcing =1 off-TPU would crash
    # at pallas_call rather than fall back — the force flag widens the band,
    # never the backend
    return on_tpu and shape_ok
