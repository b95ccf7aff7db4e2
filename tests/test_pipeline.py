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


def init_hift_params(key, cfg: HiFTConfig) -> Params:
    d: Params = {}
    kg = KeyGen(key)
    import jax.numpy as jnp

    init_linear(kg(), d, "m_source.l_linear", cfg.nb_harmonics + 1, 1)
    init_conv1d(kg(), d, "conv_pre", cfg.in_channels, cfg.base_channels, 7)
    ch = cfg.base_channels
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        init_conv_transpose1d(kg(), d, f"ups.{i}", ch // (2 ** i), ch // (2 ** (i + 1)), k)
        c = ch // (2 ** (i + 1))
        import numpy as np
        down_cum = list(np.cumprod([1] + list(cfg.upsample_rates)[::-1][:-1])[::-1])
        du = int(down_cum[i])
        init_conv1d(kg(), d, f"source_downs.{i}", cfg.istft_n_fft + 2, c,
                    1 if du == 1 else du * 2)
        sk = cfg.source_resblock_kernel_sizes[i]
        for j, dl in enumerate(cfg.source_resblock_dilation_sizes[i]):
            init_conv1d(kg(), d, f"source_resblocks.{i}.convs1.{j}", c, c, sk)
            init_conv1d(kg(), d, f"source_resblocks.{i}.convs2.{j}", c, c, sk)
            d[f"source_resblocks.{i}.activations1.{j}.alpha"] = jnp.ones((c,))
            d[f"source_resblocks.{i}.activations2.{j}.alpha"] = jnp.ones((c,))
        for j in range(nk):
            kk = cfg.resblock_kernel_sizes[j]
            for l, dl in enumerate(cfg.resblock_dilation_sizes[j]):
                init_conv1d(kg(), d, f"resblocks.{i * nk + j}.convs1.{l}", c, c, kk)
                init_conv1d(kg(), d, f"resblocks.{i * nk + j}.convs2.{l}", c, c, kk)
                d[f"resblocks.{i * nk + j}.activations1.{l}.alpha"] = jnp.ones((c,))
                d[f"resblocks.{i * nk + j}.activations2.{l}.alpha"] = jnp.ones((c,))
    init_conv1d(kg(), d, "conv_post", c, cfg.istft_n_fft + 2, 7)
    for i in range(5):
        init_conv1d(kg(), d, f"f0_predictor.condnet.{2 * i}",
                    cfg.in_channels if i == 0 else cfg.f0_predictor_cond_channels,
                    cfg.f0_predictor_cond_channels, 3)
    init_linear(kg(), d, "f0_predictor.classifier", cfg.f0_predictor_cond_channels, 1)
    return d


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
