"""On-chip isolation of the dropout cost found by probe_trainstep.py.

probe_trainstep r7: dropout is ~13 ms of the 80 ms b8 joint grad step
(16%) even with the rbg hardware RNG.  Candidate explanations, each timed
here in isolation at the training step's real mask volume:

  a) many-small-calls — ~120 RngBitGenerator ops/step, each with fixed
     dispatch/loop overhead, vs ONE pooled generation of the same bits;
  b) bits->uniform-float conversion in jax.random.bernoulli, vs a raw
     uint32 threshold compare (P(bits < round(keep*2^32)) == keep to 2^-32);
  c) the where/divide apply pass itself (mask-apply with precomputed masks).

Usage: python tools/probe_dropout.py
"""

import os

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# b8 joint-step mask volume: ~60 dropout sites/micro x accum2, activation
# (8, 178, 1024) bf16-ish.  Model as N sites of (8, 178, 1024).
N_SITES = 120
SHAPE = (8, 178, 1024)
ELEMS = int(np.prod(SHAPE))


def _sync(out):
    np.asarray(jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0]))


def timeit(fn, *args, depth=4, reps=3):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(depth)]
        _sync(outs[-1])
        ts.append((time.perf_counter() - t0) / depth)
    return float(np.median(ts)) * 1e3


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    keep = 0.9
    x = jnp.ones(SHAPE, jnp.bfloat16)
    key = jax.random.key(0, impl="rbg")

    def many_bernoulli(k, x):
        acc = x
        for i in range(N_SITES):
            m = jax.random.bernoulli(jax.random.fold_in(k, i), keep, SHAPE)
            acc = jnp.where(m, acc / keep, 0).astype(x.dtype)
        return acc

    def many_bits_thresh(k, x):
        thresh = jnp.uint32(round(keep * (2**32 - 1)))
        acc = x
        for i in range(N_SITES):
            b = jax.random.bits(jax.random.fold_in(k, i), SHAPE, jnp.uint32)
            acc = jnp.where(b < thresh, acc / keep, 0).astype(x.dtype)
        return acc

    def pooled_bits(k, x):
        thresh = jnp.uint32(round(keep * (2**32 - 1)))
        pool = jax.random.bits(k, (N_SITES,) + SHAPE, jnp.uint32)
        acc = x
        for i in range(N_SITES):
            acc = jnp.where(pool[i] < thresh, acc / keep, 0).astype(x.dtype)
        return acc

    def apply_only(ms, x):
        acc = x
        for i in range(N_SITES):
            acc = jnp.where(ms[i], acc / keep, 0).astype(x.dtype)
        return acc

    rows = [
        ("bernoulli x120 (current)", jax.jit(many_bernoulli), (key, x)),
        ("uint32-thresh x120", jax.jit(many_bits_thresh), (key, x)),
        ("one pooled bits call", jax.jit(pooled_bits), (key, x)),
    ]
    for name, fn, args in rows:
        t = timeit(fn, *args)
        print(f"{name:28s}: {t:7.2f} ms", flush=True)
    masks = jax.jit(lambda k: jax.random.bits(
        key, (N_SITES,) + SHAPE, jnp.uint32) < jnp.uint32(2**31))(key)
    t = timeit(jax.jit(apply_only), masks, x)
    print(f"{'apply-only (precomp masks)':28s}: {t:7.2f} ms", flush=True)
    gbits = N_SITES * ELEMS * 4 / 1e9
    print(f"(mask volume {N_SITES}x{SHAPE} = {gbits:.1f} GB of uint32 bits; "
          f"HBM floor ~{gbits/770*1e3:.2f} ms at 770 GB/s)", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
