"""A/B the short-first-hop TTFA lever (InferenceConfig.first_chunk_tokens).

The remaining v1 streaming TTFA (~515 ms idle-host) is dominated by the
first decode segment (hop 100 + overlap 20 tokens) plus the first token2wav
(PERF.md TTFA decomposition).  ``first_chunk_tokens=50`` (half the
reference's 2 s * 50 tok/s first hop, cosyvoice/cli/model.py:51-61) roughly
halves the first segment at a possible seam-quality cost where chunk 1
joins chunk 2 — this probe measures the full decision triple on the real
chip (VERDICT r4 next #7):

  - TTFA / total RTF via the bench's own stream harness (best-of-4,
    loadavg-flagged) for first_chunk_tokens in {off, 50};
  - seam MCD: DTW-MCD between each arm's concatenated streamed audio and
    the NON-streamed synthesis of the same rng (token streams are identical
    by construction, so this isolates chunk-seam artifacts), plus the
    off-arm's own seam MCD as the baseline the 50-arm must not worsen.

Run idle (the stream harness is host-timing-sensitive):
    python tools/probe_first_chunk.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def seam_mcd(model_cfg, icfg, text_len=64, seed=2):
    """MCD(streamed concat, offline) for one pipeline config."""
    from cosy_tpu.config import InferenceConfig
    from cosy_tpu.infer.pipeline import TTSPipeline
    from cosy_tpu.models import flow as F, llm as L
    from cosy_tpu.models.hift import init_hift_params
    from cosy_tpu.ops.audio import mel_spectrogram
    from cosy_tpu.ops.mcd import mcd
    from cosy_tpu.params import cast

    key = jax.random.PRNGKey(0)
    llm_params = cast(jax.jit(lambda k: L.init_llm_params(k, model_cfg.llm))(key),
                      jnp.bfloat16)
    flow_params = cast(jax.jit(lambda k: F.init_flow_params(k, model_cfg.flow))(
        jax.random.fold_in(key, 1)), jnp.bfloat16)
    hift_params = init_hift_params(jax.random.fold_in(key, 3), model_cfg.hift)
    pipe = TTSPipeline(model_cfg, llm_params, flow_params, hift_params,
                       icfg or InferenceConfig(), finetuned_norm=True)
    rng = np.random.default_rng(0)
    text = rng.integers(0, 1000, (1, text_len)).astype(np.int32)
    k = jax.random.PRNGKey(seed)
    stream = np.concatenate(
        [np.asarray(c["tts_speech"]) for c in
         pipe.synthesize(k, text_tokens=text, stream=True)], axis=1)
    offline = np.concatenate(
        [np.asarray(c["tts_speech"]) for c in
         pipe.synthesize(k, text_tokens=text, stream=False)], axis=1)
    m_s = np.asarray(mel_spectrogram(jnp.asarray(stream)))[0].T
    m_o = np.asarray(mel_spectrogram(jnp.asarray(offline)))[0].T
    return mcd(m_s, m_o, align=True), stream.shape[1] / 22050.0


def main():
    from bench import bench_stream_e2e, log
    from cosy_tpu.config import InferenceConfig, ModelConfig, replace

    mc = ModelConfig()
    rows = {}
    for fc in (0, 50):
        icfg = replace(InferenceConfig(), first_chunk_tokens=fc)
        ttfa, rtf, _, load1 = bench_stream_e2e(mc, icfg=icfg)
        m, audio_s = seam_mcd(mc, icfg)
        rows[fc] = (ttfa, rtf, m, load1)
        log(f"[first-chunk {fc or 'off'}] TTFA {ttfa*1e3:.0f} ms, RTF "
            f"{rtf:.3f}, seam MCD {m:.3f} dB ({audio_s:.1f}s audio, "
            f"loadavg {load1:.1f})")
    t0, r0, m0, _ = rows[0]
    t1, r1, m1, _ = rows[50]
    log(f"[first-chunk A/B] TTFA {t0*1e3:.0f} -> {t1*1e3:.0f} ms "
        f"({(1 - t1 / t0) * 100:+.0f}%), RTF {r0:.3f} -> {r1:.3f}, "
        f"seam MCD {m0:.3f} -> {m1:.3f} dB (delta {m1 - m0:+.3f})")
    os._exit(0)


if __name__ == "__main__":
    main()
