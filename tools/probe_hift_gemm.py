"""On-chip A/B: HiFT decode with XLA convs vs the im2col-GEMM formulation.

PERF.md's r6 analysis left HiFT at ~15 TFLOP/s effective on its ~200 GFLOP
conv stack ("conv-efficiency-bound at C=128/256; further gains need
architectural change").  conv1d_gemm (layers/basic.py) re-expresses every
stride-1 decode conv as k dilation-shifted activation views contracted in
ONE einsum — an (T, k*C) x (k*C, out) matmul the MXU tiles directly,
trading k-fold activation HBM reads for MXU-shaped flops.  This probe
decides HiFTConfig.gemm_convs' default with whole-decode steady-state
timings at production shapes (B1, the token2wav path).

Methodology: depth-k enqueue, device_get sync (PERF.md).  Run on an IDLE
host — bench.py's loadavg warning applies.

Usage: python tools/probe_hift_gemm.py [T_mel ...]
"""

import dataclasses
import os
import sys
import time

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosy_tpu.config import HiFTConfig
from cosy_tpu.models.hift import hift_decode, init_hift_params
from cosy_tpu.params import P


def bench(cfg, params, mel, source, depth=8):
    fn = jax.jit(lambda p, m, s: hift_decode(P(p), cfg, m, s))
    wav = fn(params, mel, source)
    jax.device_get(jnp.ravel(wav)[0])  # compile
    t0 = time.perf_counter()
    jax.device_get(jnp.ravel(fn(params, mel, source))[0])
    t_lat = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(params, mel, source) for _ in range(depth)]
        jax.device_get(jnp.ravel(outs[-1])[0])
        ts.append((time.perf_counter() - t0) / depth)
    return float(np.median(ts)), t_lat, wav


def main():
    t_mels = [int(a) for a in sys.argv[1:]] or [430, 860, 2580]
    cfg = HiFTConfig()
    params = init_hift_params(jax.random.PRNGKey(0), cfg)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    up = int(np.prod(cfg.upsample_rates)) * cfg.istft_hop_len

    print(f"devices: {jax.devices()}")
    print(f"{'T_mel':>6} {'xla ms':>9} {'gemm ms':>9} {'speedup':>8} "
          f"{'max|err|':>9}")
    for t_mel in t_mels:
        rng = np.random.default_rng(t_mel)
        mel = jnp.asarray(rng.standard_normal((1, 80, t_mel)), jnp.float32)
        source = jnp.asarray(
            rng.standard_normal((1, 1, t_mel * up)) * 0.1, jnp.float32)
        t_x, lat_x, wav_x = bench(cfg, params, mel, source)
        t_g, lat_g, wav_g = bench(
            dataclasses.replace(cfg, gemm_convs=True), params, mel, source)
        err = float(jnp.max(jnp.abs(wav_x - wav_g)))
        print(f"{t_mel:>6} {t_x * 1e3:>9.2f} {t_g * 1e3:>9.2f} "
              f"{t_x / t_g:>8.2f} {err:>9.1e}  "
              f"(latency {lat_x * 1e3:.1f} / {lat_g * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
