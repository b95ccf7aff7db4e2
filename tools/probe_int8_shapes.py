"""Probe W8A8 dynamic-quant vs bf16 at the estimator's actual matmul shapes.

Estimator transformer block (dim 256, heads 8 x 64 -> inner 512, ff 1024):
  qkv:  (M,256)@(256,512) x3      out: (M,512)@(512,256)
  ff1:  (M,256)@(256,1024)        ff2: (M,1024)@(1024,256)
M = B*T (CFG-doubled B8 x T512 = 4096).

Chains a full block's worth of projections (attention math excluded) so the
XLA fusion of quantize-into-producer is realistic.  Differenced fori_loop.
"""
from __future__ import annotations

import time
import jax
import jax.numpy as jnp
from jax import lax


def _sync(y):
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[0])


def _time(fn, x, n_lo=200, n_hi=600, reps=3):
    lo = jax.jit(lambda v: lax.fori_loop(0, n_lo, lambda i, a: fn(a), v))
    hi = jax.jit(lambda v: lax.fori_loop(0, n_hi, lambda i, a: fn(a), v))
    _sync(lo(x)); _sync(hi(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); _sync(lo(x)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _sync(hi(x)); t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best


def quant_rows(x):
    xs = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                             keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127
                  ).astype(jnp.int8)
    return xq, xs


def qmat(w):
    sc = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / sc), -127, 127
                  ).astype(jnp.int8)
    return wq, sc


def main():
    M = 4096
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    x0 = jax.random.normal(ks[0], (M, 256), jnp.bfloat16)
    Wq = jax.random.normal(ks[1], (256, 512), jnp.bfloat16) * 0.06
    Wo = jax.random.normal(ks[2], (512, 256), jnp.bfloat16) * 0.05
    W1 = jax.random.normal(ks[3], (256, 1024), jnp.bfloat16) * 0.06
    W2 = jax.random.normal(ks[4], (1024, 256), jnp.bfloat16) * 0.03

    flops = 2 * M * (256 * 512 * 3 + 512 * 256 + 256 * 1024 + 1024 * 256)

    def bf_block(x):
        q = jnp.dot(x, Wq); k = jnp.dot(x, Wq); v = jnp.dot(x, Wq)
        a = jnp.dot((q + k + v).astype(jnp.bfloat16), Wo)
        h = jax.nn.gelu(jnp.dot((x + a).astype(jnp.bfloat16), W1))
        return (x + jnp.dot(h.astype(jnp.bfloat16), W2)).astype(jnp.bfloat16)

    t = _time(bf_block, x0)
    print(f"bf16 block projections: {t*1e3:.3f} ms = {flops/t/1e12:.1f} TFLOP/s")

    Wq8, sq = qmat(Wq); Wo8, so = qmat(Wo); W18, s1 = qmat(W1); W28, s2 = qmat(W2)

    def dot8(xq, xs, w8, ws):
        y = lax.dot_general(xq, w8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * xs * ws)

    def i8_block(x):
        xq, xs = quant_rows(x)
        q = dot8(xq, xs, Wq8, sq); k = q; v = q
        aq, as_ = quant_rows((q + k + v).astype(jnp.bfloat16))
        a = dot8(aq, as_, Wo8, so)
        hq, hs = quant_rows((x.astype(jnp.float32) + a).astype(jnp.bfloat16))
        h = jax.nn.gelu(dot8(hq, hs, W18, s1))
        h8, hs2 = quant_rows(h.astype(jnp.bfloat16))
        return (x.astype(jnp.float32) + dot8(h8, hs2, W28, s2)
                ).astype(jnp.bfloat16)

    t = _time(i8_block, x0)
    print(f"w8a8 block projections: {t*1e3:.3f} ms = {flops/t/1e12:.1f} TFLOP-equiv/s")

    # attention-score shapes: per (b,h): (512,64)@(64,512) and (512,512)@(512,64)
    B, H, T, d = 8, 8, 512, 64
    q = jax.random.normal(ks[5], (B, H, T, d), jnp.bfloat16)
    kk = jax.random.normal(ks[6], (B, H, T, d), jnp.bfloat16)
    v = jax.random.normal(ks[7], (B, H, T, d), jnp.bfloat16)
    aflops = 2 * B * H * (T * T * d * 2)

    def bf_attn(q):
        s = jnp.einsum("bhtd,bhsd->bhts", q, kk) * (1 / 8.0)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhts,bhsd->bhtd", p, v).astype(jnp.bfloat16)

    t = _time(bf_attn, q)
    print(f"bf16 attn core (B8H8T512d64): {t*1e3:.3f} ms = {aflops/t/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
