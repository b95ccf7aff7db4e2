"""CosyVoice2 end-to-end pipeline test on tiny configs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosy_tpu.config import EncoderConfig, EstimatorConfig, HiFTConfig, InferenceConfig
from cosy_tpu.layers.qwen2 import Qwen2Config
from cosy_tpu.models.qwen2lm import Qwen2LMConfig, init_qwen2lm_params
from cosy_tpu.models.flow2 import Flow2Config, init_flow2_params
from cosy_tpu.infer.pipeline2 import TTS2Pipeline

from test_pipeline import init_hift_params

LCFG = Qwen2LMConfig(
    llm_input_size=32, llm_output_size=32, speech_token_size=30,
    qwen=Qwen2Config(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                     vocab_size=50))

FCFG = Flow2Config(
    input_size=16, output_size=80, spk_embed_dim=12, vocab_size=33,
    encoder=EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                          linear_units=24, num_blocks=1, static_chunk_size=4),
    num_up_blocks=1,
    estimator=EstimatorConfig(in_channels=320, out_channels=80, channels=(12, 12),
                              attention_head_dim=4, n_blocks=1, num_mid_blocks=1,
                              num_heads=2),
    decoder_static_chunk_size=4,
)

HCFG = HiFTConfig(
    in_channels=80, base_channels=16, nb_harmonics=2,
    upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
    istft_n_fft=16, istft_hop_len=4,
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    source_resblock_kernel_sizes=(3, 3), source_resblock_dilation_sizes=((1,), (1,)),
    f0_predictor_cond_channels=8,
)


def _pipe():
    key = jax.random.PRNGKey(0)
    return TTS2Pipeline(
        LCFG, FCFG, HCFG,
        init_qwen2lm_params(jax.random.fold_in(key, 1), LCFG),
        init_flow2_params(jax.random.fold_in(key, 2), FCFG),
        init_hift_params(jax.random.fold_in(key, 3), HCFG),
        InferenceConfig(nfe_short=2),
        hop_samples=256,
    )


def test_cosyvoice2_nonstream():
    pipe = _pipe()
    text = np.random.default_rng(0).integers(0, 50, (1, 5)).astype(np.int32)
    outs = list(pipe.synthesize(jax.random.PRNGKey(7), text))
    assert len(outs) == 1
    wav = outs[0]["tts_speech"]
    assert wav.shape[0] == 1 and wav.shape[1] > 0
    assert np.isfinite(wav).all()
    # token_mel_ratio 2, hift upsampling 8*8*4=256 -> 512 samples per token
    assert wav.shape[1] % 512 == 0


def test_cosyvoice2_vc_and_prompted():
    pipe = _pipe()
    rng = np.random.default_rng(1)
    src_tok = rng.integers(0, 30, (1, 12)).astype(np.int32)
    ptok = rng.integers(0, 30, (1, 4)).astype(np.int32)
    pfeat = rng.standard_normal((1, 8, 80)).astype(np.float32)
    spk = rng.standard_normal((1, 12)).astype(np.float32)
    outs = list(pipe.synthesize(jax.random.PRNGKey(8), source_speech_token=src_tok,
                                flow_prompt_speech_token=ptok, prompt_feat=pfeat,
                                flow_embedding=spk))
    wav = outs[0]["tts_speech"]
    assert wav.shape[1] == 12 * 2 * 256  # 12 tokens * ratio 2 * 256 samples/frame
    assert np.isfinite(wav).all()


def test_cosyvoice2_stream_producer_matches_full():
    pipe = _pipe()
    text = np.random.default_rng(2).integers(0, 50, (1, 6)).astype(np.int32)
    rng = jax.random.PRNGKey(9)
    full = pipe.generate_tokens(rng, text)
    chunks = list(pipe.generate_tokens_stream(rng, text, seg_tokens=4))
    assert chunks[-1][1] is True
    np.testing.assert_array_equal(chunks[-1][0], full)


def test_cosyvoice2_streaming_synthesis_smoke():
    pipe = _pipe()
    text = np.random.default_rng(3).integers(0, 50, (1, 6)).astype(np.int32)
    outs = list(pipe.synthesize(jax.random.PRNGKey(10), text, stream=True))
    assert len(outs) >= 1
    for o in outs:
        assert np.isfinite(o["tts_speech"]).all()
    assert sum(o["tts_speech"].shape[1] for o in outs) > 0


def test_cosyvoice2_synthesize_batch():
    pipe = _pipe()
    rng = np.random.default_rng(6)
    texts = [rng.integers(0, 50, (1, n)).astype(np.int32) for n in (4, 6)]
    wavs = pipe.synthesize_batch(jax.random.PRNGKey(13), texts,
                                 speed=[1.0, 1.0])
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 2 and w.shape[1] > 0 and np.isfinite(w).all()


def test_cosyvoice2_stream_batch_cohort():
    """Cohort streaming: every stream chunks to completion with finite audio,
    and its token stream matches the non-streamed batched decode."""
    pipe = _pipe()
    rng = np.random.default_rng(8)
    texts = [rng.integers(0, 50, (1, n)).astype(np.int32) for n in (5, 7)]
    key = jax.random.PRNGKey(17)
    chunks = {0: [], 1: []}
    dones = set()
    for b, wav, done in pipe.synthesize_stream_batch(key, texts):
        assert wav.ndim == 2 and np.isfinite(wav).all()
        chunks[b].append(wav)
        if done:
            dones.add(b)
    assert dones == {0, 1}
    for b in (0, 1):
        assert sum(w.shape[1] for w in chunks[b]) > 0


def test_cosyvoice2_int8_decode_pipeline():
    """int8_decode=True quantizes the Qwen2 projections at pipeline build
    (quant.py) and the whole synthesis path still runs."""
    key = jax.random.PRNGKey(0)
    pipe = TTS2Pipeline(
        LCFG, FCFG, HCFG,
        init_qwen2lm_params(jax.random.fold_in(key, 1), LCFG),
        init_flow2_params(jax.random.fold_in(key, 2), FCFG),
        init_hift_params(jax.random.fold_in(key, 3), HCFG),
        InferenceConfig(nfe_short=2, int8_decode=True),
        hop_samples=256,
    )
    from cosy_tpu.quant import count_quantized
    assert count_quantized(pipe.llm_params) > 0
    text = np.random.default_rng(3).integers(0, 50, (1, 5)).astype(np.int32)
    outs = list(pipe.synthesize(jax.random.PRNGKey(9), text))
    assert len(outs) == 1 and np.isfinite(outs[0]["tts_speech"]).all()


@pytest.mark.slow
def test_cosyvoice2_streaming_fused_chunk_matches_staged():
    """The one-program CV2 streaming chunk must equal the staged path."""
    text = np.random.default_rng(12).integers(0, 50, (1, 6)).astype(np.int32)

    def run(disable_fused):
        pipe = _pipe()
        if disable_fused:
            pipe._token2wav_stream_fused = lambda *a, **k: None
        return [o["tts_speech"] for o in
                pipe.synthesize(jax.random.PRNGKey(33), text, stream=True)]

    staged = run(True)
    fused = run(False)
    assert len(staged) == len(fused)
    for a, b in zip(staged, fused):
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=2e-4)
