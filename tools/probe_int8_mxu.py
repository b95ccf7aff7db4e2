"""Probe: does an int8 x int8 -> int32 dot reach the v5e's int8 MXU mode
(~2x bf16 peak), and what does a dynamically-quantized int8 matmul chain
sustain vs bf16?

Methodology: device-side lax.fori_loop chains of n matmuls, differenced
(n_hi vs n_lo) to cancel dispatch/sync cost — robust to host contention
(PERF.md measurement notes).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax


def _time_chain(fn, x, n_lo=6, n_hi=18, reps=3):
    lo = jax.jit(lambda v: lax.fori_loop(0, n_lo, lambda i, a: fn(a), v))
    hi = jax.jit(lambda v: lax.fori_loop(0, n_hi, lambda i, a: fn(a), v))
    # warm up + compile
    jax.block_until_ready(lo(x)); _sync(lo(x))
    jax.block_until_ready(hi(x)); _sync(hi(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); _sync(lo(x)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _sync(hi(x)); t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best


def _sync(y):
    # true sync through the tunnel: fetch one element that depends on result
    jax.device_get(jnp.ravel(y)[0])


def main():
    n = 4096
    flops = 2 * n * n * n

    key = jax.random.key(0)
    a8 = jax.random.randint(key, (n, n), -127, 127, jnp.int8)
    b8 = jax.random.randint(key, (n, n), -127, 127, jnp.int8)
    abf = jax.random.normal(key, (n, n), jnp.bfloat16)
    bbf = jax.random.normal(key, (n, n), jnp.bfloat16)

    # bf16 reference chain
    def bf_step(x):
        return jnp.dot(x, bbf).astype(jnp.bfloat16)
    t = _time_chain(bf_step, abf)
    print(f"bf16 {n}^3 chain: {t*1e3:.3f} ms/matmul = {flops/t/1e12:.1f} TFLOP/s")

    # pure int8 x int8 -> int32 chain (requantize to keep dtype closed)
    def i8_step(x):
        y = lax.dot_general(x, b8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return (y >> 12).astype(jnp.int8)
    t = _time_chain(i8_step, a8)
    print(f"int8 {n}^3 chain:  {t*1e3:.3f} ms/matmul = {flops/t/1e12:.1f} TOP/s")

    # realistic dynamic-quant matmul: bf16 activations -> per-row int8,
    # int8 dot, rescale to bf16
    wsc = jnp.max(jnp.abs(bbf.astype(jnp.float32)), axis=0) / 127.0
    wq = jnp.clip(jnp.round(bbf.astype(jnp.float32) / wsc), -127, 127).astype(jnp.int8)

    def dq_step(x):
        xs = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                                 keepdims=True), 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127
                      ).astype(jnp.int8)
        y = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * xs * wsc).astype(jnp.bfloat16)
    t = _time_chain(dq_step, abf)
    print(f"dynq {n}^3 chain:  {t*1e3:.3f} ms/matmul = {flops/t/1e12:.1f} TFLOP-equiv/s")


if __name__ == "__main__":
    main()
