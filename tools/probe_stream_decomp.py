"""Decompose the v1 single-stream streaming TTFA (bench stream_ttfa_ms =
1302 ms in builder R4 — 4-5x the naive floor of ~120 decoded tokens + one
chunked t2w).  Times each stage of the first audio chunk separately on the
real chip:

  1. segment decode to the first token boundary (120 tokens, stop_at)
  2. the first t2w_stream chunk program
  3. steady per-chunk cost of subsequent segments
  4. reference points: plain llm_decode at the same capacity bucket with
     stop_at=120, and at bucket 256

Run: python tools/probe_stream_decomp.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cosy_tpu.config import InferenceConfig, ModelConfig  # noqa: E402
from cosy_tpu.infer.pipeline import TTSPipeline  # noqa: E402
from cosy_tpu.models import flow as F, llm as L  # noqa: E402
from cosy_tpu.models.hift import init_hift_params  # noqa: E402
from cosy_tpu.params import P, cast  # noqa: E402


def main():
    model_cfg = ModelConfig()
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices(), flush=True)
    llm_params = cast(jax.jit(lambda k: L.init_llm_params(k, model_cfg.llm))(key),
                      jnp.bfloat16)
    flow_params = cast(jax.jit(lambda k: F.init_flow_params(k, model_cfg.flow))(
        jax.random.fold_in(key, 1)), jnp.bfloat16)
    hift_params = init_hift_params(jax.random.fold_in(key, 3), model_cfg.hift)
    pipe = TTSPipeline(model_cfg, llm_params, flow_params, hift_params,
                       InferenceConfig(), finetuned_norm=True)
    rng = np.random.default_rng(0)
    text = rng.integers(0, 1000, (1, 64)).astype(np.int32)

    # full warm pass (compiles everything)
    t0 = time.perf_counter()
    n = 0
    for chunk in pipe.synthesize(jax.random.PRNGKey(1), text_tokens=text,
                                 stream=True):
        n += np.asarray(chunk["tts_speech"]).shape[1]
    print(f"warm pass: {time.perf_counter()-t0:.1f} s, {n/22050:.1f}s audio",
          flush=True)

    # --- stage 1+3: the token producer alone -------------------------------
    for rep in range(2):
        t0 = time.perf_counter()
        producer = pipe.generate_tokens_stream(jax.random.PRNGKey(2 + rep), text)
        seg_times = []
        tprev = time.perf_counter()
        total = 0
        for tokens, done in producer:
            now = time.perf_counter()
            seg_times.append(now - tprev)
            tprev = now
            total = tokens.shape[1]
            if len(seg_times) >= 6 and not done:
                break
        print(f"[decode-seg rep{rep}] first {seg_times[0]*1e3:.0f} ms, "
              f"next {[f'{s*1e3:.0f}' for s in seg_times[1:]]} ms "
              f"({total} tokens so far)", flush=True)

    # --- stage 2: the first t2w_stream chunk -------------------------------
    from cosy_tpu.infer.pipeline import StreamState

    window = rng.integers(0, model_cfg.flow.vocab_size, (1, 120)).astype(np.int32)
    zero_emb = np.zeros((1, model_cfg.flow.spk_embed_dim), np.float32)
    for rep in range(3):
        state = StreamState(mel_overlap=np.zeros((1, 80, 0), np.float32))
        t0 = time.perf_counter()
        wav, state = pipe.token2wav(jax.random.PRNGKey(7 + rep), window, None,
                                    None, zero_emb, stream_state=state,
                                    finalize=False)
        wav = np.asarray(wav)
        print(f"[t2w-stream rep{rep}] first chunk {1e3*(time.perf_counter()-t0):.0f} ms "
              f"({wav.shape[1]/22050:.2f}s audio)", flush=True)

    # --- stage 4: plain decode at the same capacity bucket -----------------
    prefix, min_len, max_len = pipe._build_prefix(text, None, None, None, 2048)
    from cosy_tpu.infer.pipeline import _cap_bucket

    for cap_bucket in (_cap_bucket(max_len), 256):
        fn = jax.jit(lambda p, r, stop: L.llm_decode(
            P(p), model_cfg.llm, r, prefix, prefix.shape[1],
            jnp.asarray(int(min_len)), cap_bucket, stop_at=stop))
        res = fn(llm_params, jax.random.PRNGKey(3), jnp.asarray(120))
        int(jax.block_until_ready(res.length))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            res = fn(llm_params, jax.random.PRNGKey(4 + i), jnp.asarray(120))
            nn = int(jax.block_until_ready(res.length))
            ts.append(time.perf_counter() - t0)
        print(f"[plain decode cap={cap_bucket}] stop_at=120: "
              f"{1e3*float(np.median(ts)):.0f} ms ({nn} tokens)", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
