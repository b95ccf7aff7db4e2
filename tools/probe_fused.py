"""On-chip A/B: fused whole-block Pallas kernel vs XLA path, whole CFM solve.

Methodology (PERF.md "hardware model"): depth-k enqueue, sync once — per-program
tunnel RTT overlaps with device execution.  COSY_TPU_FUSED_BLOCK toggles the
kernel; a fresh jit closure per setting forces a re-trace so the env gate is
re-read.  Usage: python tools/probe_fused.py [T ...]
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


def solve_ms(est_params, cfg, z, mu, spks, cond, nfe=10, depth=12):
    fn = jax.jit(lambda p, zz: F.cfm_solve_euler(
        P(p), cfg.flow, zz, None, mu, spks, cond, nfe, EVAL))
    jax.block_until_ready(fn(est_params, z))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(est_params, z) for _ in range(depth)]
        jax.block_until_ready(outs[-1])
        ts.append((time.perf_counter() - t0) / depth)
    return float(np.median(ts)) * 1e3


def main():
    Ts = [int(a) for a in sys.argv[1:]] or [256, 512]
    cfg = ModelConfig()
    key = jax.random.PRNGKey(0)
    kg = KeyGen(key)
    est_params = {}
    init_conditional_decoder(kg, est_params, "", cfg.flow.estimator)
    est_params = cast(est_params, jnp.bfloat16)
    B, nfe = 4, 10
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for T in Ts:
        z = jax.random.normal(key, (B, 80, T), jnp.bfloat16)
        mu = jax.random.normal(key, (B, 80, T), jnp.bfloat16)
        spks = jax.random.normal(key, (B, 80), jnp.bfloat16)
        cond = jnp.zeros((B, 80, T), jnp.bfloat16)
        res = {}
        for env in ("0", "1"):
            os.environ["COSY_TPU_FUSED_BLOCK"] = env
            try:
                res[env] = solve_ms(est_params, cfg, z, mu, spks, cond, nfe)
            except Exception as e:  # noqa: BLE001
                res[env] = float("nan")
                print(f"T={T} env={env} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", file=sys.stderr)
        os.environ.pop("COSY_TPU_FUSED_BLOCK", None)
        n_calls = nfe * 2  # PERF.md convention: CFG-doubled batch counted as 2 calls/step
        print(f"T={T}: xla {res['0']:.1f} ms/solve ({res['0']/n_calls:.2f} ms/call), "
              f"fused {res['1']:.1f} ms/solve ({res['1']/n_calls:.2f} ms/call), "
              f"ratio xla/fused {res['0']/res['1']:.3f}")


if __name__ == "__main__":
    main()
