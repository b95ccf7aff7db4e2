"""On-chip A/B: Pallas one-tile flash attention vs XLA einsum attention,
attention-op level at several estimator shapes, then estimator-solve level
with the kernel force-enabled.  Steady-state depth-k methodology (PERF.md).
Run on the real TPU: ``python tools/probe_flash.py``.
"""

import os

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")  # stale cross-host AOT cache is a SIGILL risk

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cosy_tpu.ops.flash_attention import flash_attention  # noqa: E402


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def steady(fn, *args, depth=16, reps=3):
    _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(depth)]
        _sync(outs[-1])
        ts.append((time.perf_counter() - t0) / depth)
    return float(np.median(ts)) * 1e3


def ab_attention(B=8, H=8, d=64, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    for T in (256, 512, 1024):
        q = jax.random.normal(key, (B, H, T, d), dtype)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, T, d), dtype)
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, T, d), dtype)
        scale = d ** -0.5

        @jax.jit
        def xla_attn(q, k, v):
            s = jnp.einsum("bhtd,bhsd->bhts", q, k) * scale
            a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            return jnp.einsum("bhts,bhsd->bhtd", a, v)

        pl_attn = jax.jit(lambda q, k, v: flash_attention(q, k, v, None, scale))
        err = float(np.max(np.abs(np.asarray(pl_attn(q, k, v), np.float32)
                                  - np.asarray(xla_attn(q, k, v), np.float32))))
        t_x = steady(xla_attn, q, k, v)
        t_p = steady(pl_attn, q, k, v)
        print(f"[attn-ab] T={T}: XLA {t_x:.3f} ms, pallas {t_p:.3f} ms "
              f"({t_x / t_p:.2f}x), max|err| {err:.1e}", flush=True)


def ab_estimator(T=1024, B=4, nfe=10, dtype=jnp.bfloat16):
    from cosy_tpu.config import ModelConfig
    from cosy_tpu.ctx import EVAL
    from cosy_tpu.layers.unet import init_conditional_decoder
    from cosy_tpu.models import flow as F
    from cosy_tpu.params import KeyGen, P, cast

    model_cfg = ModelConfig()
    key = jax.random.PRNGKey(0)
    est_params = {}
    init_conditional_decoder(KeyGen(key), est_params, "", model_cfg.flow.estimator)
    est_params = cast(est_params, dtype)
    z = jax.random.normal(key, (B, 80, T), dtype)
    mu = jax.random.normal(key, (B, 80, T), dtype)
    spks = jax.random.normal(key, (B, 80), dtype)
    cond = jnp.zeros((B, 80, T), dtype)

    import cosy_tpu.ops.flash_attention as fa

    for mode in ("xla", "pallas"):
        orig = fa.use_flash
        fa.use_flash = (lambda T_, d_: True) if mode == "pallas" else (lambda T_, d_: False)
        try:
            fn = jax.jit(lambda p, z: F.cfm_solve_euler(
                P(p), model_cfg.flow, z, None, mu, spks, cond, nfe, EVAL))
            t = steady(fn, est_params, z, depth=8)
            print(f"[est-ab] T={T} nfe={nfe} {mode}: {t:.1f} ms/solve "
                  f"({t / (2 * nfe):.2f} ms/estimator call)", flush=True)
        finally:
            fa.use_flash = orig


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    ab_attention()
    ab_estimator()
    os._exit(0)  # axon plugin can hang at interpreter exit
