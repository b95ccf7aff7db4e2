"""On-chip token2wav RTF with the distilled MeanFlow sampler vs Euler.

PERF.md's distillation section projected ~0.0035 RTF from the solve-only
A/B (tools/probe_meanflow.py); this probe measures the real fused
token2wav path (flow solve + HiFT) end to end through the pipeline with
InferenceConfig.sampler="meanflow", so the number includes the HiFT and
dispatch costs the projection had to assume.  Random 300M-topology weights
+ zero-init time_mlp_s branch — compute identical to a distilled
checkpoint's (quality is a per-voice property, train/distill.py).

Depth-8 enqueue steady-state, device_get sync (PERF.md methodology).

Usage: python tools/probe_meanflow_rtf.py [n_tokens]
"""

import os
import sys
import time

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosy_tpu.config import InferenceConfig, ModelConfig, replace as creplace
import cosy_tpu.models.flow as F
from cosy_tpu.models.hift import init_hift_params
from cosy_tpu.infer.pipeline import TTSPipeline
from cosy_tpu.train.distill import add_meanflow_time_branch


def bench_pipe(model_cfg, flow_params, hift_params, icfg, tokens, depth=8):
    pipe = TTSPipeline(model_cfg, {}, flow_params, hift_params, icfg,
                       finetuned_norm=True)

    def run(seed=1, sync=True):
        wav, _ = pipe.token2wav(
            jax.random.PRNGKey(seed), jnp.asarray(tokens), None, None,
            np.zeros((1, model_cfg.flow.spk_embed_dim), np.float32),
            finalize=True, sync=sync)
        return wav

    wav = np.asarray(run())  # compile + audio length
    audio_s = wav.shape[1] / 22050.0
    t0 = time.perf_counter()
    run()
    t_lat = time.perf_counter() - t0
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        outs = [run(seed=10 + rep * depth + j, sync=False) for j in range(depth)]
        jax.device_get(jnp.ravel(outs[-1])[0])
        ts.append((time.perf_counter() - t0) / depth)
    t = float(np.median(ts))
    return t, t_lat, audio_s


def main():
    n_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    model_cfg = ModelConfig()
    key = jax.random.PRNGKey(0)
    flow_params = jax.jit(lambda k: F.init_flow_params(k, model_cfg.flow))(key)
    flow_params = add_meanflow_time_branch(flow_params, model_cfg.flow.estimator,
                                           jax.random.fold_in(key, 7))
    hift_params = init_hift_params(jax.random.fold_in(key, 3), model_cfg.hift)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, model_cfg.flow.vocab_size,
                          (1, n_tokens)).astype(np.int32)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    if hasattr(os, "getloadavg") and os.getloadavg()[0] > 1.5:
        print(f"[WARN] loadavg {os.getloadavg()[0]:.2f} > 1.5 — steady-state "
              "timings unreliable (PERF.md)", file=sys.stderr)

    rows = [("euler (nfe by length)", InferenceConfig()),
            ("meanflow 2-step", InferenceConfig(sampler="meanflow",
                                                meanflow_steps=2)),
            ("meanflow 1-step", InferenceConfig(sampler="meanflow",
                                                meanflow_steps=1))]
    base = None
    for name, icfg in rows:
        t, t_lat, audio_s = bench_pipe(model_cfg, flow_params, hift_params,
                                       icfg, tokens)
        rtf = t / audio_s
        speed = f" ({base / t:.2f}x vs euler)" if base else ""
        if base is None:
            base = t
        print(f"{name:22s}: {t * 1e3:6.1f} ms steady (lat {t_lat * 1e3:5.0f} ms)"
              f" for {audio_s:.2f}s audio -> RTF {rtf:.4f}"
              f" ({1 / rtf:.0f}x realtime){speed}")
    os._exit(0)  # axon plugin can hang at interpreter exit


if __name__ == "__main__":
    main()
