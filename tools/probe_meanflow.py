"""On-chip A/B: few-step MeanFlow sampler vs the Euler CFG solve.

Timing-only comparison at the production 300M estimator topology (random
weights + zero-init time_mlp_s branch — the compute is identical to a
distilled checkpoint's; output quality is a per-voice distillation property,
train/distill.py).  Depth-k enqueue steady-state, device_get sync (PERF.md
methodology).

Usage: python tools/probe_meanflow.py [B T [B T ...]]
"""

import os
import sys
import time

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosy_tpu.config import ModelConfig
from cosy_tpu.ctx import EVAL
from cosy_tpu.params import P, KeyGen, cast
import cosy_tpu.models.flow as F
from cosy_tpu.layers.unet import init_conditional_decoder
from cosy_tpu.train.distill import add_meanflow_time_branch


def run_ms(fn, params, z, depth=8):
    def sync(y):
        jax.device_get(jnp.ravel(y)[0])

    sync(fn(params, z))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(params, z) for _ in range(depth)]
        sync(outs[-1])
        ts.append((time.perf_counter() - t0) / depth)
    return float(np.median(ts)) * 1e3


def main():
    args = [int(a) for a in sys.argv[1:]]
    shapes = list(zip(args[::2], args[1::2])) or [(1, 430), (4, 512)]
    cfg = ModelConfig()
    key = jax.random.PRNGKey(0)
    kg = KeyGen(key)
    est = {}
    init_conditional_decoder(kg, est, "", cfg.flow.estimator)
    est = add_meanflow_time_branch(est, cfg.flow.estimator,
                                   jax.random.PRNGKey(1), prefix="")
    est = cast(est, jnp.bfloat16)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    if hasattr(os, "getloadavg") and os.getloadavg()[0] > 1.5:
        print(f"[WARN] loadavg {os.getloadavg()[0]:.2f} > 1.5 — steady-state "
              "timings unreliable (PERF.md)", file=sys.stderr)

    for B, T in shapes:
        z = jax.random.normal(key, (B, 80, T), jnp.bfloat16)
        mu = jax.random.normal(key, (B, 80, T), jnp.bfloat16)
        spks = jax.random.normal(key, (B, 80), jnp.bfloat16)
        cond = jnp.zeros((B, 80, T), jnp.bfloat16)

        res = {}
        for nfe in (10, 15):
            fn = jax.jit(lambda p, zz, n=nfe: F.cfm_solve_euler(
                P(p), cfg.flow, zz, None, mu, spks, cond, n, EVAL))
            res[f"euler{nfe}"] = run_ms(fn, est, z)
        for nfe in (1, 2):
            fn = jax.jit(lambda p, zz, n=nfe: F.cfm_solve_mean(
                P(p), cfg.flow, zz, None, mu, spks, cond, n, EVAL))
            res[f"mean{nfe}"] = run_ms(fn, est, z)
        e10, e15 = res["euler10"], res["euler15"]
        m1, m2 = res["mean1"], res["mean2"]
        print(f"B{B} T{T}: euler10 {e10:.2f} ms | euler15 {e15:.2f} ms | "
              f"mean2 {m2:.2f} ms ({e15 / m2:.1f}x vs euler15) | "
              f"mean1 {m1:.2f} ms ({e15 / m1:.1f}x)")


if __name__ == "__main__":
    main()
