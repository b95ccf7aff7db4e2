"""On-chip A/B: banded (windowed) estimator attention vs full attention.

Measures the whole CFM solve (depth-k enqueue steady-state, PERF.md
methodology) at long-utterance lengths with COSY_TPU_ATTN_WINDOW toggled,
plus the output delta between the banded and full solves (rel-err over the
production 300M topology at seeded init — the real checkpoint does not ship
in this image, so the quality impact on trained weights must be validated
by the user; the feature ships opt-in).

Usage: python tools/probe_banded.py [window [T ...]]
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


def solve_fn(cfg, mu, spks, cond, nfe):
    return jax.jit(lambda p, zz: F.cfm_solve_euler(
        P(p), cfg.flow, zz, None, mu, spks, cond, nfe, EVAL))


def run_ms(fn, est_params, z, depth=8):
    jax.block_until_ready(fn(est_params, z))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(est_params, z) for _ in range(depth)]
        jax.block_until_ready(outs[-1])
        ts.append((time.perf_counter() - t0) / depth)
    return float(np.median(ts)) * 1e3


def main():
    args = sys.argv[1:]
    window = int(args[0]) if args else 256
    Ts = [int(a) for a in args[1:]] or [1280, 2048, 2560]
    cfg = ModelConfig()
    key = jax.random.PRNGKey(0)
    kg = KeyGen(key)
    est_params = {}
    init_conditional_decoder(kg, est_params, "", cfg.flow.estimator)
    est_params = cast(est_params, jnp.bfloat16)
    B, nfe = 4, 10
    print(f"devices: {jax.devices()}  window={window}", file=sys.stderr)
    for T in Ts:
        z = jax.random.normal(key, (B, 80, T), jnp.bfloat16)
        mu = jax.random.normal(key, (B, 80, T), jnp.bfloat16)
        spks = jax.random.normal(key, (B, 80), jnp.bfloat16)
        cond = jnp.zeros((B, 80, T), jnp.bfloat16)
        res, outs = {}, {}
        for env in ("0", str(window)):
            os.environ["COSY_TPU_ATTN_WINDOW"] = env
            fn = solve_fn(cfg, mu, spks, cond, nfe)
            try:
                res[env] = run_ms(fn, est_params, z)
                outs[env] = np.asarray(fn(est_params, z), np.float32)
            except Exception as e:  # noqa: BLE001
                res[env] = float("nan")
                print(f"T={T} window={env} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", file=sys.stderr)
        os.environ.pop("COSY_TPU_ATTN_WINDOW", None)
        w = str(window)
        delta = ""
        if "0" in outs and w in outs:
            a, b = outs["0"], outs[w]
            rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
            delta = f", output rel-err {rel:.4f}"
        n_calls = nfe * 2
        print(f"T={T}: full {res['0']:.1f} ms/solve ({res['0']/n_calls:.2f} ms/call), "
              f"banded {res[w]:.1f} ms/solve ({res[w]/n_calls:.2f} ms/call), "
              f"speedup {res['0']/res[w]:.2f}x{delta}")


if __name__ == "__main__":
    main()
