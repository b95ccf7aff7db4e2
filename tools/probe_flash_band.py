"""On-chip whole-solve A/B for extending the flash-attention default band
below T=1024 (the 512<T<1024 mid-length-utterance regime was never probed).

Per T, solves the estimator CFM with the default band (XLA attention at
this T) vs COSY_TPU_FLASH_MIN_T=T (one-tile flash kernel at this T, all
other regimes unchanged — unlike COSY_TPU_FLASH=1, the U-Net's T/2
mid-blocks keep their measured-default routing in BOTH arms, so the A/B is
attributable).  Steady-state depth-k methodology (PERF.md).

Usage: python tools/probe_flash_band.py [T ...]   (default 640 768 896)
"""

import os

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosy_tpu.config import ModelConfig
from cosy_tpu.ctx import EVAL
from cosy_tpu.params import P, KeyGen, cast
import cosy_tpu.models.flow as F
from cosy_tpu.layers.unet import init_conditional_decoder


def _sync(out):
    np.asarray(jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0]))


def solve_ms(est_params, cfg, z, mu, spks, cond, nfe=10, depth=8):
    fn = jax.jit(lambda p, zz: F.cfm_solve_euler(
        P(p), cfg.flow, zz, None, mu, spks, cond, nfe, EVAL))
    out = fn(est_params, z)
    _sync(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(est_params, z) for _ in range(depth)]
        _sync(outs[-1])
        ts.append((time.perf_counter() - t0) / depth)
    return float(np.median(ts)) * 1e3, np.asarray(out, np.float32)


def main():
    Ts = [int(a) for a in sys.argv[1:]] or [640, 768, 896]
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
        res, outs = {}, {}
        for name, min_t in (("xla", None), ("flash", T)):
            if min_t is None:
                os.environ.pop("COSY_TPU_FLASH_MIN_T", None)
            else:
                os.environ["COSY_TPU_FLASH_MIN_T"] = str(min_t)
            try:
                res[name], outs[name] = solve_ms(
                    est_params, cfg, z, mu, spks, cond, nfe)
            finally:
                os.environ.pop("COSY_TPU_FLASH_MIN_T", None)
        d = np.abs(outs["flash"] - outs["xla"])
        print(f"T{T}: xla {res['xla']:.1f} ms/solve, flash {res['flash']:.1f} "
              f"ms/solve ({res['xla']/res['flash']:.2f}x), "
              f"max|err| {d.max():.1e} mean {d.mean():.1e}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
