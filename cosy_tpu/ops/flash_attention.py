"""Pallas TPU flash attention.

Fused softmax(QK^T * scale [+ bias]) V for the attention shapes this
framework runs hot — chiefly the CFM U-Net estimator (called 2*NFE times per
Euler solve at (B, heads<=8, T<=1k, d=64)).

Design (see the Pallas guide): grid over (batch, head, q-blocks); K/V stream
through VMEM in k-blocks with an online-softmax running max/denominator.
The additive bias is shared across heads — (B, T, S), indexed per batch so it
is never materialized per head.  When the mask is pure right-padding, pass
``k_valid`` lengths instead of a bias and the kernel masks the tail with an
iota compare (no (T, S) bias traffic at all).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG = -1e10


def _cdiv(a, b):
    return -(-a // b)


def _make_kernel(scale, block_k, n_kb, with_bias, precision):
    from jax.experimental import pallas as pl

    def kernel(*refs):
        if with_bias:
            kv_ref, q_ref, k_ref, v_ref, bias_ref, o_ref = refs
        else:
            kv_ref, q_ref, k_ref, v_ref, o_ref = refs
            bias_ref = None
        Bq, d = q_ref.shape[-2:]
        q = q_ref[0, 0].astype(jnp.float32) * scale
        # k_valid rides whole in SMEM (Mosaic rejects sub-array SMEM blocks);
        # pick this batch's entry by grid position.
        k_valid = kv_ref[pl.program_id(0)]

        def body(i, carry):
            m_prev, l_prev, acc = carry
            k = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
            v = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=precision)
            if bias_ref is not None:
                s = s + bias_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
            kpos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (Bq, block_k), 1)
            s = jnp.where(kpos < k_valid, s, NEG)

            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=precision)
            return m_new, l_new, acc

        m0 = jnp.full((Bq, 1), NEG, jnp.float32)
        l0 = jnp.zeros((Bq, 1), jnp.float32)
        acc0 = jnp.zeros((Bq, q.shape[-1]), jnp.float32)
        _, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return kernel


def _make_one_tile_kernel(scale, with_bias, out_dtype):
    """Whole-(T,S) attention for one (b, h) per grid step.

    For the estimator regime (T <= ~1k, d=64) the streaming online-softmax
    kernel loses to XLA: its per-q-block fori_loop is a sequential
    dependency chain of tiny MXU ops and VPU exps.  One big QK^T, one fully
    vectorized softmax, and one big PV (bf16 MXU passes, f32 accum) keeps
    both units saturated; scores stay in VMEM (T*S*4B, fits to T=S=1408)."""
    from jax.experimental import pallas as pl

    def kernel(*refs):
        if with_bias:
            kv_ref, q_ref, k_ref, v_ref, bias_ref, o_ref = refs
        else:
            kv_ref, q_ref, k_ref, v_ref, o_ref = refs
            bias_ref = None
        T, d = q_ref.shape[-2:]
        S = k_ref.shape[-2]
        k_valid = kv_ref[pl.program_id(0)]
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
        s = jnp.where(kpos < k_valid, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(out_dtype)

    return kernel


def _one_tile_attention(q, k, v, bias, scale, k_valid, interpret, block_q=None):
    """One-tile kernel, optionally q-blocked.

    ``block_q=None``: one grid step per (b, h), whole (T, S) scores in VMEM
    (fits to S=1152).  ``block_q=N``: grid (b, h, T/N) — each step still sees
    ALL keys in one tile (no online-softmax loop), so the sequential-chain
    pathology of the streaming kernel never appears; only the q rows are
    split.  Extends the kernel to the long-utterance estimator regime
    (S up to ~2.6k mel frames = 30 s audio)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, d = q.shape
    S = k.shape[2]
    Tp = _cdiv(T, 8) * 8
    Sp = _cdiv(S, 128) * 128
    if block_q is not None:
        Tp = _cdiv(T, block_q) * block_q
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    if k_valid is None:
        k_valid = jnp.full((B,), S, jnp.int32)
    k_valid = k_valid.astype(jnp.int32).reshape(B)
    with_bias = bias is not None

    kernel = _make_one_tile_kernel(scale, with_bias, q.dtype)
    Bq = Tp if block_q is None else block_q
    grid = (B, H) if block_q is None else (B, H, Tp // block_q)
    ix = ((lambda b, h: (b, h, 0, 0)) if block_q is None
          else (lambda b, h, i: (b, h, i, 0)))
    ix0 = ((lambda b, h: (b, h, 0, 0)) if block_q is None
           else (lambda b, h, i: (b, h, 0, 0)))
    ixs = ((lambda b, h: (0,)) if block_q is None
           else (lambda b, h, i: (0,)))
    in_specs = [
        pl.BlockSpec((B,), ixs, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, Bq, d), ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sp, d), ix0, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sp, d), ix0, memory_space=pltpu.VMEM),
    ]
    args = [k_valid, qp, kp, vp]
    if with_bias:
        bp = jnp.pad(bias, ((0, 0), (0, Tp - T), (0, Sp - S)))
        ixb = ((lambda b, h: (b, 0, 0)) if block_q is None
               else (lambda b, h, i: (b, i, 0)))
        in_specs.append(pl.BlockSpec((1, Bq, Sp), ixb,
                                     memory_space=pltpu.VMEM))
        args.append(bp)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, Bq, d), ix, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * Sp * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=B * H * Tp * Sp,
        ),
    )(*args)
    return out[:, :, :T, :]


# scores for one (b, h) must fit VMEM: S*T*4B (f32) plus q/k/v/out
MAX_ONE_TILE_S = 1152
# beyond that, q-blocked one-tile (whole S per q block) up to:
MAX_QBLOCK_S = 8192


def _qblock_for(S_padded: int, with_bias: bool) -> int:
    """Largest 128-aligned q block keeping the f32 score tile ~4 MB
    (halved when a bias tile must also sit in VMEM)."""
    budget = 2 ** 20 if not with_bias else 2 ** 19
    return max(128, (budget // S_padded) // 128 * 128)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,  # (B, H, T, d)
    k: jax.Array,  # (B, H, S, d)
    v: jax.Array,  # (B, H, S, d)
    bias: Optional[jax.Array],  # (B, T, S) additive, shared across heads; or None
    scale: float,
    k_valid: Optional[jax.Array] = None,  # (B,) int32 valid key lengths (None -> S)
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention; pads T/S to block multiples internally."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, d = q.shape
    S = k.shape[2]
    if S <= MAX_ONE_TILE_S:
        return _one_tile_attention(q, k, v, bias, scale, k_valid, interpret)
    if S <= MAX_QBLOCK_S:
        Sp = _cdiv(S, 128) * 128
        # clamp to padded T so skinny-T calls don't pad up to a full block
        qb = min(_qblock_for(Sp, bias is not None),
                 max(128, _cdiv(q.shape[2], 128) * 128))
        return _one_tile_attention(q, k, v, bias, scale, k_valid, interpret,
                                   block_q=qb)
    Tp = _cdiv(T, block_q) * block_q
    Sp = _cdiv(S, block_k) * block_k

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    if k_valid is None:
        k_valid = jnp.full((B,), S, jnp.int32)
    k_valid = k_valid.astype(jnp.int32).reshape(B)

    with_bias = bias is not None
    # fp32 inputs get full-precision MXU passes; bf16 (the production
    # estimator dtype) uses the native single-pass path.
    precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kernel = _make_kernel(scale, block_k, Sp // block_k, with_bias, precision)

    in_specs = [
        # full (B,) vector in SMEM, same block every grid step — indexed
        # in-kernel by pl.program_id(0)
        pl.BlockSpec((B,), lambda b, h, i: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sp, d), lambda b, h, i: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sp, d), lambda b, h, i: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [k_valid, qp, kp, vp]
    if with_bias:
        bp = jnp.pad(bias, ((0, 0), (0, Tp - T), (0, Sp - S)))
        in_specs.append(pl.BlockSpec((1, block_q, Sp), lambda b, h, i: (b, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bp)

    out = pl.pallas_call(
        kernel,
        grid=(B, H, Tp // block_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * Sp * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=B * H * Tp * Sp,
        ),
    )(*args)
    return out[:, :, :T, :]


# ---------------------------------------------------------------------------
# Banded (windowed) attention — opt-in flop-level win for long utterances
# ---------------------------------------------------------------------------


def _make_banded_kernel(scale, Bq, window, out_dtype):
    """One q block per grid step; keys restricted to the 3 adjacent k blocks
    (prev/self/next), which cover the ±window band whenever window <= Bq.

    Same design family as the one-tile kernel: one QK^T, fully vectorized
    softmax, one PV — no online-softmax loop.  The band mask is an iota
    compare on GLOBAL positions, so the clamped duplicate tiles at the
    sequence boundaries are masked out by position, never by data."""
    from jax.experimental import pallas as pl

    def kernel(kv_ref, q_ref, km_ref, k0_ref, kp_ref, vm_ref, v0_ref, vp_ref, o_ref):
        i = pl.program_id(2)
        k_valid = kv_ref[pl.program_id(0)]
        q = q_ref[0, 0]
        ks = jnp.concatenate([km_ref[0, 0], k0_ref[0, 0], kp_ref[0, 0]], axis=0)
        s = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        trow = i * Bq + jax.lax.broadcasted_iota(jnp.int32, (Bq, 3 * Bq), 0)
        spos = (i - 1) * Bq + jax.lax.broadcasted_iota(jnp.int32, (Bq, 3 * Bq), 1)
        ok = (spos >= 0) & (spos < k_valid) & (jnp.abs(trow - spos) <= window)
        s = jnp.where(ok, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        vs = jnp.concatenate([vm_ref[0, 0], v0_ref[0, 0], vp_ref[0, 0]], axis=0)
        acc = jax.lax.dot_general(p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(out_dtype)

    return kernel


def banded_block(window: int) -> int:
    """q/k block size for a ±window band: 128-aligned, >= window."""
    return max(128, _cdiv(window, 128) * 128)


@functools.partial(jax.jit, static_argnames=("scale", "window", "interpret"))
def banded_attention(
    q: jax.Array,  # (B, H, T, d) — self-attention (S == T)
    k: jax.Array,
    v: jax.Array,
    scale: float,
    window: int,  # each query attends keys within |t - s| <= window
    k_valid: Optional[jax.Array] = None,  # (B,) int32 valid key lengths
    interpret: bool = False,
) -> jax.Array:
    """Local-band attention: O(T * 3*block) instead of O(T^2) flops/bytes.

    A quality trade vs the full attention the estimator was trained with —
    ships opt-in (EstimatorConfig.attn_window); see PERF.md for the measured
    speed/output-delta trade."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, d = q.shape
    assert k.shape[2] == T, "banded attention is self-attention only"
    Bq = banded_block(window)
    Tp = _cdiv(T, Bq) * Bq
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    kp_ = jnp.pad(k, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    vp_ = jnp.pad(v, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    if k_valid is None:
        k_valid = jnp.full((B,), T, jnp.int32)
    k_valid = k_valid.astype(jnp.int32).reshape(B)
    nqb = Tp // Bq

    kernel = _make_banded_kernel(scale, Bq, window, q.dtype)
    tile = lambda fn: pl.BlockSpec((1, 1, Bq, d), fn, memory_space=pltpu.VMEM)
    ix_self = lambda b, h, i: (b, h, i, 0)
    ix_prev = lambda b, h, i: (b, h, jnp.maximum(i - 1, 0), 0)
    ix_next = lambda b, h, i: (b, h, jnp.minimum(i + 1, nqb - 1), 0)
    out = pl.pallas_call(
        kernel,
        grid=(B, H, nqb),
        in_specs=[
            pl.BlockSpec((B,), lambda b, h, i: (0,), memory_space=pltpu.SMEM),
            tile(ix_self),
            tile(ix_prev), tile(ix_self), tile(ix_next),
            tile(ix_prev), tile(ix_self), tile(ix_next),
        ],
        out_specs=tile(ix_self),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * 3 * Bq * d,
            bytes_accessed=(qp.size + 3 * kp_.size + 3 * vp_.size) * qp.dtype.itemsize,
            transcendentals=B * H * Tp * 3 * Bq,
        ),
    )(k_valid, qp, kp_, kp_, kp_, vp_, vp_, vp_)
    return out[:, :, :T, :]


def use_banded(T: int, d: int, window: int) -> bool:
    """Gate for the banded kernel: TPU, lane-aligned head dim, and a band
    narrow enough relative to T that the win is real.  Measured on-chip
    (tools/probe_banded.py, whole-CFM-solve A/B vs the default flash path,
    window=256): T1280 0.79x, T1536 0.87x, T2048 1.02x, T2304 1.14x,
    T2560 1.37x — the kernel re-reads each k/v tile 3x and part of the band
    tile is masked waste, so the raw flop reduction must be ~3x before the
    wall-clock win appears.  window=128 is NOT faster than 256 (the kernel
    is grid-step-overhead-bound, not flop-bound, at narrow bands).
    Require Tp >= 9 blocks — the measured T2304 crossover."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False
    Bq = banded_block(window)
    Tp = _cdiv(T, Bq) * Bq
    return on_tpu and d % 8 == 0 and d <= 256 and Tp >= 9 * Bq


def use_flash(T: int, d: int) -> bool:
    """Gate for routing production attention through the Pallas kernel.

    Default ON exactly where the one-tile kernel wins in context (measured
    round 2, estimator-level steady-state A/B on the real chip, PERF.md):
    T=1024 solves run 10% faster end-to-end (6.48 vs 7.18 ms/estimator
    call); at T<=512 the pallas_call boundary blocks XLA's fusion of
    attention with the surrounding projections and the whole solve gets
    SLOWER (3.28 vs 2.37 ms/call at T512) even though the op-level
    micro-benchmark says otherwise (those are submit-floor-bound at ~2 ms —
    do not trust micro A/Bs below ~1 ms device time).  Above MAX_ONE_TILE_S
    the q-blocked one-tile variant extends the win monotonically as the
    quadratic attention takes over the solve — whole-solve A/Bs: 1.15x at
    T1280, 1.26x at T2048, 1.49x at T2560 (the 30 s-audio production
    maximum); default ON through MAX_QBLOCK_S on that trend.  Beyond it the
    streaming kernel would engage and lose — stay with XLA.
    COSY_TPU_FLASH=1 forces on (gate shapes only), =0 forces off;
    COSY_TPU_FLASH_MIN_T overrides just the band's lower edge (used by
    tools/probe_flash_band.py to A/B candidate band extensions without
    force-flashing the U-Net's T/2 mid-blocks into a known-loss regime)."""
    import os

    env = os.environ.get("COSY_TPU_FLASH", "")
    if env == "0":
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False
    shape_ok = on_tpu and d % 8 == 0 and d <= 256
    if env:  # forced on: any gate-compatible shape
        return shape_ok and T >= 256
    min_t = int(os.environ.get("COSY_TPU_FLASH_MIN_T", "1024"))
    return shape_ok and min_t <= T <= MAX_QBLOCK_S
