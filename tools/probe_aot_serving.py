"""On-chip A/B: serving-program compile time, cold vs AOT-cached.

Measures what serve.py --aot-cache buys: the time from pipeline construction
to the first synthesized waveform (the cold-start cost --warmup exists to
front-load) at the production 300M flow topology, twice — first with an
empty cache directory (compiles and persists), then in a fresh pipeline
(loads executables via jax.experimental.serialize_executable instead of
compiling).

Usage: python tools/probe_aot_serving.py [n_tokens]

Run each phase in its own process for a honest cross-process claim:
    python tools/probe_aot_serving.py --phase cold /tmp/aotdir
    python tools/probe_aot_serving.py --phase warm /tmp/aotdir
(default: both phases in-process, fresh wrapper objects = restart stand-in)
"""

import argparse
import os
import sys
import time

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosy_tpu.config import ModelConfig
from cosy_tpu.models.flow import init_flow_params
from cosy_tpu.models.hift import init_hift_params
from cosy_tpu.infer.pipeline import TTSPipeline
from cosy_tpu.utils import aot


def first_audio_seconds(n_tokens: int) -> float:
    """Build the pipeline and time to the first token2wav waveform."""
    cfg = ModelConfig()
    flow_p = init_flow_params(jax.random.PRNGKey(0), cfg.flow)
    hift_p = init_hift_params(jax.random.PRNGKey(1), cfg.hift)
    tokens = np.random.default_rng(0).integers(
        0, cfg.flow.vocab_size, (1, n_tokens)).astype(np.int32)
    t0 = time.perf_counter()
    pipe = TTSPipeline(cfg, {}, flow_p, hift_p, finetuned_norm=True)
    wav, _ = pipe.token2wav(
        jax.random.PRNGKey(2), tokens, None, None,
        np.zeros((1, cfg.flow.spk_embed_dim), np.float32), finalize=True)
    wav = np.asarray(wav)
    dt = time.perf_counter() - t0
    assert np.isfinite(wav).all() and wav.size > 0
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_tokens", nargs="?", type=int, default=250)
    ap.add_argument("--phase", choices=["both", "cold", "warm"],
                    default="both")
    ap.add_argument("cache_dir", nargs="?", default="/tmp/cosy_aot_probe")
    args = ap.parse_args()

    if args.phase in ("both", "cold"):
        import shutil

        shutil.rmtree(args.cache_dir, ignore_errors=True)
        aot.set_cache_dir(args.cache_dir)
        cold = first_audio_seconds(args.n_tokens)
        print(f"[aot] cold first-audio: {cold:.1f}s "
              f"(misses {aot.AOT_STATS['misses']}, persisted "
              f"{len(os.listdir(args.cache_dir))} programs)")
    if args.phase in ("both", "warm"):
        aot.set_cache_dir(args.cache_dir)
        aot.AOT_STATS.update(hits=0, misses=0, errors=0)
        warm = first_audio_seconds(args.n_tokens)
        print(f"[aot] cached first-audio: {warm:.1f}s "
              f"(hits {aot.AOT_STATS['hits']}, misses "
              f"{aot.AOT_STATS['misses']}, errors {aot.AOT_STATS['errors']})")
    if args.phase == "both":
        print(f"[aot] speedup {cold / warm:.1f}x")
    os._exit(0)  # axon plugin can hang at interpreter exit


if __name__ == "__main__":
    main()
