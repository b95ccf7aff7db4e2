"""On-chip A/B: full serving warmup cost, cold vs AOT-cached.

Drives the same program set serve.py --warmup compiles (solo non-streaming +
streaming, B=1 batched decode, B=2 streaming cohort) at the production 300M
topology (random weights — compile cost does not depend on weight values),
and times pipeline-build -> all-programs-ready.  Run the two phases in
separate processes for the honest cross-process restart claim:

    python tools/probe_aot_warmup.py --phase cold /tmp/aot_warmup
    python tools/probe_aot_warmup.py --phase warm /tmp/aot_warmup
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["cold", "warm"], required=True)
    ap.add_argument("cache_dir", nargs="?", default="/tmp/cosy_aot_warmup")
    ap.add_argument("--text-len", type=int, default=12)
    args = ap.parse_args()

    if args.phase == "cold":
        import shutil

        shutil.rmtree(args.cache_dir, ignore_errors=True)
    from cosy_tpu.utils import aot

    aot.set_cache_dir(args.cache_dir)

    from cosy_tpu.config import InferenceConfig, ModelConfig
    from cosy_tpu.params import cast
    from cosy_tpu.models import flow as F, llm as L
    from cosy_tpu.models.hift import init_hift_params
    from cosy_tpu.infer.pipeline import TTSPipeline

    t0 = time.perf_counter()
    cfg = ModelConfig()
    key = jax.random.PRNGKey(0)
    llm_params = cast(jax.jit(lambda k: L.init_llm_params(k, cfg.llm))(key),
                      jnp.bfloat16)
    flow_params = jax.jit(lambda k: F.init_flow_params(k, cfg.flow))(
        jax.random.fold_in(key, 2))
    hift_params = init_hift_params(jax.random.fold_in(key, 3), cfg.hift)
    pipe = TTSPipeline(cfg, llm_params, flow_params, hift_params,
                       InferenceConfig(), finetuned_norm=True)
    t_build = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.llm.text_token_size,
                       (1, args.text_len)).astype(np.int32)
    zero = np.zeros((1, cfg.llm.spk_embed_dim), np.float32)

    marks = {}

    def mark(name, fn):
        t = time.perf_counter()
        fn()
        marks[name] = time.perf_counter() - t
        print(f"[warmup] {name}: {marks[name]:.1f}s "
              f"(hits {aot.AOT_STATS['hits']} misses {aot.AOT_STATS['misses']})",
              flush=True)

    mark("solo", lambda: [None for _ in pipe.synthesize(
        jax.random.PRNGKey(1), ids, spk_embedding=zero, stream=False)])
    mark("solo_stream", lambda: [None for _ in pipe.synthesize(
        jax.random.PRNGKey(2), ids, spk_embedding=zero, stream=True)])
    mark("batched_b1", lambda: pipe.synthesize_batch(
        jax.random.PRNGKey(3), [ids], [zero]))
    mark("cohort_b2", lambda: [None for _ in pipe.synthesize_stream_batch(
        jax.random.PRNGKey(4), [ids, ids], [zero, zero])])

    total = t_build + sum(marks.values())
    print(f"[warmup] {args.phase}: build {t_build:.1f}s + programs "
          f"{sum(marks.values()):.1f}s = {total:.1f}s total "
          f"(hits {aot.AOT_STATS['hits']}, misses {aot.AOT_STATS['misses']}, "
          f"errors {aot.AOT_STATS['errors']}, "
          f"{len(os.listdir(args.cache_dir))} blobs)")
    os._exit(0)  # axon plugin can hang at interpreter exit


if __name__ == "__main__":
    main()
