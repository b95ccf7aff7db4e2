"""End-to-end TTS pipeline test on tiny configs: text tokens -> wav chunks."""

import numpy as np
import jax

from cosy_tpu.config import (
    ModelConfig, FlowConfig, LLMConfig, EncoderConfig, EstimatorConfig, HiFTConfig,
    InferenceConfig, replace,
)
from cosy_tpu.models import flow as F, llm as L
from cosy_tpu.params import KeyGen, Params, init_linear, init_conv1d, init_conv_transpose1d
from cosy_tpu.infer.pipeline import TTSPipeline
from cosy_tpu.models.hift import init_hift_params

TINY_ENC = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                         linear_units=24, num_blocks=1)

MODEL_CFG = ModelConfig(
    llm=LLMConfig(
        text_encoder_input_size=16, llm_input_size=16, llm_output_size=16,
        text_token_size=40, speech_token_size=30, spk_embed_dim=12,
        text_encoder=replace(TINY_ENC, static_chunk_size=1),
        llm=replace(TINY_ENC, static_chunk_size=1, input_layer="linear_legacy"),
    ),
    flow=FlowConfig(
        input_size=16, output_size=80, spk_embed_dim=12, vocab_size=30,
        encoder=TINY_ENC,
        estimator=EstimatorConfig(in_channels=320, out_channels=80, channels=(16, 16),
                                  attention_head_dim=4, n_blocks=1, num_mid_blocks=1,
                                  num_heads=2),
    ),
    hift=HiFTConfig(
        in_channels=80, base_channels=16, nb_harmonics=2,
        upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        source_resblock_kernel_sizes=(3, 3), source_resblock_dilation_sizes=((1,), (1,)),
        f0_predictor_cond_channels=8,
    ),
)


def _build_pipeline():
    key = jax.random.PRNGKey(0)
    llm_params = L.init_llm_params(jax.random.fold_in(key, 1), MODEL_CFG.llm)
    flow_params = F.init_flow_params(jax.random.fold_in(key, 2), MODEL_CFG.flow)
    hift_params = init_hift_params(jax.random.fold_in(key, 3), MODEL_CFG.hift)
    return TTSPipeline(MODEL_CFG, llm_params, flow_params, hift_params,
                       InferenceConfig(), finetuned_norm=True)


def test_prompt_free_synthesis():
    pipe = _build_pipeline()
    text = np.random.default_rng(0).integers(0, 40, (1, 6)).astype(np.int32)
    outs = list(pipe.synthesize(jax.random.PRNGKey(5), text))
    assert len(outs) == 1
    wav = outs[0]["tts_speech"]
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert wav.shape[1] > 0
    assert np.isfinite(wav).all()
    # tokens -> mel -> wav length relation: 256 samples per mel frame
    assert wav.shape[1] % 256 == 0


def test_prompted_synthesis_with_boundary_trim():
    pipe = _build_pipeline()
    rng = np.random.default_rng(1)
    text = rng.integers(0, 40, (1, 5)).astype(np.int32)
    prompt_tok = rng.integers(0, 30, (1, 8)).astype(np.int32)
    prompt_feat = (rng.standard_normal((1, 12, 80)) * 2 - 6).astype(np.float32)
    spk = rng.standard_normal((1, 12)).astype(np.float32)
    outs = list(pipe.synthesize(jax.random.PRNGKey(6), text,
                                prompt_speech_token=prompt_tok,
                                prompt_feat=prompt_feat, spk_embedding=spk))
    wav = outs[0]["tts_speech"]
    assert np.isfinite(wav).all() and wav.shape[1] > 0


def test_stream_token_producer_matches_full_decode():
    """Segment-wise decode (the streaming producer) must yield exactly the
    tokens of one uninterrupted decode under the same rng."""
    pipe = _build_pipeline()
    text = np.random.default_rng(3).integers(0, 40, (1, 8)).astype(np.int32)
    rng = jax.random.PRNGKey(11)
    full = pipe.generate_tokens(rng, text)
    chunks = list(pipe.generate_tokens_stream(rng, text))
    assert chunks[-1][1] is True
    np.testing.assert_array_equal(chunks[-1][0], full)
    # monotone prefix property
    prev = 0
    for toks, _done in chunks:
        assert toks.shape[1] >= prev
        np.testing.assert_array_equal(toks[:, :prev], chunks[-1][0][:, :prev])
        prev = toks.shape[1]


def test_streaming_synthesis_smoke():
    pipe = _build_pipeline()
    text = np.random.default_rng(4).integers(0, 40, (1, 8)).astype(np.int32)
    outs = list(pipe.synthesize(jax.random.PRNGKey(12), text, stream=True))
    assert len(outs) >= 1
    for o in outs:
        wav = o["tts_speech"]
        assert wav.ndim == 2 and np.isfinite(wav).all()
    total = sum(o["tts_speech"].shape[1] for o in outs)
    assert total > 0


def test_stream_batch_cohort_matches_batch_tokens():
    """synthesize_stream_batch: every stream emits chunks; the underlying
    token streams must equal synthesize_batch's (same fold_in(rng, b)
    streams), and each stream produces finite audio."""
    pipe = _build_pipeline()
    rng = np.random.default_rng(11)
    texts = [rng.integers(0, 40, (1, n)).astype(np.int32) for n in (8, 6, 7)]
    key = jax.random.PRNGKey(21)

    # reference: the non-streaming batched path (token parity target)
    wavs_batch = pipe.synthesize_batch(key, texts)

    chunks = {b: [] for b in range(3)}
    dones = set()
    for b, wav, done in pipe.synthesize_stream_batch(key, texts):
        assert wav.ndim == 2 and np.isfinite(wav).all()
        assert b not in dones, "chunk after done"
        chunks[b].append(wav)
        if done:
            dones.add(b)
    assert dones == {0, 1, 2}
    for b in range(3):
        # all non-final chunks cover exactly one hop of audio each
        hop_samples = {w.shape[1] for w in chunks[b][:-1]}
        assert len(hop_samples) <= 1, hop_samples
        total = sum(w.shape[1] for w in chunks[b])
        # chunked audio must track the non-streamed run (fades/caches trim
        # only seam-sized amounts)
        ref = wavs_batch[b].shape[1]
        assert 0.7 * ref <= total <= 1.3 * ref, (total, ref)


def test_streaming_fused_chunk_matches_staged():
    """The one-program streaming chunk (_t2w_stream_jit) must produce the
    same audio and carries as the staged flow->fades->HiFT path."""
    text = np.random.default_rng(9).integers(0, 40, (1, 8)).astype(np.int32)

    def run(disable_fused):
        pipe = _build_pipeline()
        if disable_fused:
            pipe._token2wav_stream_fused = lambda *a, **k: None
        return [o["tts_speech"] for o in
                pipe.synthesize(jax.random.PRNGKey(31), text, stream=True)]

    staged = run(True)
    fused = run(False)
    assert len(staged) == len(fused)
    for a, b in zip(staged, fused):
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=2e-4)


def test_decode_cap_is_exact_not_bucketed():
    """The per-request stop bound (max_token_text_ratio x text_len,
    llm.py:180) must be enforced exactly: bucketing the static capacity must
    NOT loosen the cap — a 1-token text decodes at most int(1 * 20) = 20
    tokens even when EOS never samples, not 128 (the capacity bucket)."""
    pl = _build_pipeline()
    # true cap from _build_prefix is un-bucketed
    ids = np.zeros((1, 1), np.int32)
    _, min_len, max_len = pl._build_prefix(ids, None, None, None, 2048)
    assert max_len == int(1 * pl.icfg.max_token_text_ratio)
    toks = pl.generate_tokens(jax.random.PRNGKey(0), ids)
    assert toks.shape[1] <= max_len, (toks.shape, max_len)
    # streaming producer honors the same bound
    n_last = 0
    for t, done in pl.generate_tokens_stream(jax.random.PRNGKey(0), ids):
        n_last = t.shape[1]
    assert n_last <= max_len
    # batch path: per-request caps stay exact while capacity buckets
    from cosy_tpu.infer.pipeline import _batch_prefixes

    built = [pl._build_prefix(ids, None, None, None, 2048),
             pl._build_prefix(np.zeros((1, 3), np.int32), None, None, None, 2048)]
    _, _, _, max_lens, cap_static = _batch_prefixes(built)
    assert list(np.asarray(max_lens)) == [20, 60]
    assert cap_static == 128  # bucketed capacity only


def test_stream_with_speed_rejected():
    """Reference: 'speed change only support non-stream inference mode'
    (model.py:213-214) — asserted, not silently ignored."""
    import pytest

    pl = _build_pipeline()
    text = np.zeros((1, 3), np.int32)
    with pytest.raises(ValueError, match="speed"):
        list(pl.synthesize(jax.random.PRNGKey(0), text, stream=True, speed=1.5))


def test_first_chunk_tokens_short_first_hop():
    """InferenceConfig.first_chunk_tokens (TTFA lever): the token stream is
    unchanged (segment boundaries never perturb sampling), the requested
    first hop is clamped up to the smallest window that emits non-empty
    audio, and the first streamed chunk is strictly shorter than the steady
    hop while total coverage is preserved."""
    key = jax.random.PRNGKey(0)
    llm_params = L.init_llm_params(jax.random.fold_in(key, 1), MODEL_CFG.llm)
    flow_params = F.init_flow_params(jax.random.fold_in(key, 2), MODEL_CFG.flow)
    hift_params = init_hift_params(jax.random.fold_in(key, 3), MODEL_CFG.hift)
    icfg = replace(InferenceConfig(), first_chunk_tokens=4)
    pipe = TTSPipeline(MODEL_CFG, llm_params, flow_params, hift_params,
                       icfg, finetuned_norm=True)
    # 4 is below the emission floor (mel_overlap 34 + mel_cache 20 frames
    # at ratio ~1.72) -> clamped up; still far below the 100-token hop
    assert 4 < pipe.first_hop < pipe.token_min_hop_len
    text = np.random.default_rng(3).integers(0, 40, (1, 8)).astype(np.int32)
    rng = jax.random.PRNGKey(11)
    # token stream identical to one uninterrupted decode despite the short
    # first segment target
    full = pipe.generate_tokens(rng, text)
    chunks = list(pipe.generate_tokens_stream(rng, text))
    np.testing.assert_array_equal(chunks[-1][0], full)
    # streaming via the vc path (fixed source tokens, so the chunk geometry
    # is deterministic): first window = first_hop + overlap tokens, emits a
    # short but NON-EMPTY first chunk, then the final chunk
    src = np.random.default_rng(5).integers(
        0, MODEL_CFG.flow.vocab_size, (1, 60)).astype(np.int32)
    outs = list(pipe.synthesize(jax.random.PRNGKey(12),
                                source_speech_token=src, stream=True))
    assert len(outs) == 2
    first, last = outs[0]["tts_speech"], outs[1]["tts_speech"]
    assert 0 < first.shape[1] < last.shape[1]
    for o in outs:
        assert np.isfinite(o["tts_speech"]).all()
