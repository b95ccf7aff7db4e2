"""Model-dir cosyvoice.yaml topology ingestion (compat/yaml_config.py).

Mirrors the reference's hyperpyyaml loading surface
(cosyvoice/cli/cosyvoice.py:35-54) without instantiating objects: tagged
nodes parse to dicts, shape/flag kwargs map onto the typed dataclasses, and
api.CosyVoice honors a modified yaml without code edits.
"""

import os

import cosy_tpu.api as api_mod
from cosy_tpu.api import CosyVoice
from cosy_tpu.compat.yaml_config import (
    cv2_configs_from_yaml, inference_config_from_yaml, model_config_from_yaml,
    parse_hyperyaml,
)

YAML_V1 = """
sample_rate: 22050
text_encoder_input_size: 512
llm_input_size: 1024
llm_output_size: 1024
spk_embed_dim: 192

llm: !new:cosyvoice.llm.llm.TransformerLM
    text_encoder_input_size: !ref <text_encoder_input_size>
    llm_input_size: !ref <llm_input_size>
    llm_output_size: !ref <llm_output_size>
    text_token_size: 60515
    speech_token_size: 4096
    length_normalized_loss: True
    lsm_weight: 0.0
    spk_embed_dim: !ref <spk_embed_dim>
    text_encoder: !new:cosyvoice.transformer.encoder.ConformerEncoder
        input_size: !ref <text_encoder_input_size>
        output_size: 1024
        attention_heads: 16
        linear_units: 4096
        num_blocks: 3
        dropout_rate: 0.1
        positional_dropout_rate: 0.1
        attention_dropout_rate: 0.0
        normalize_before: True
        input_layer: 'linear'
        pos_enc_layer_type: 'rel_pos_espnet'
        selfattention_layer_type: 'rel_selfattn'
        use_cnn_module: False
        macaron_style: False
        use_dynamic_chunk: False
        use_dynamic_left_chunk: False
        static_chunk_size: 1
    llm: !new:cosyvoice.transformer.encoder.TransformerEncoder
        input_size: !ref <llm_input_size>
        output_size: !ref <llm_output_size>
        attention_heads: 16
        linear_units: 4096
        num_blocks: 7
        static_chunk_size: 1
    sampling: !name:cosyvoice.utils.common.ras_sampling
        top_p: 0.7
        top_k: 20
        win_size: 8
        tau_r: 0.2

flow: !new:cosyvoice.flow.flow.MaskedDiffWithXvec
    input_size: 512
    output_size: 80
    spk_embed_dim: !ref <spk_embed_dim>
    output_type: 'mel'
    vocab_size: 4096
    input_frame_rate: 50
    only_mask_loss: True
    encoder: !new:cosyvoice.transformer.encoder.ConformerEncoder
        output_size: 512
        attention_heads: 4
        linear_units: 1024
        num_blocks: 5
        input_layer: 'linear'
    length_regulator: !new:cosyvoice.flow.length_regulator.InterpolateRegulator
        channels: 80
        sampling_ratios: [1, 1, 1]
    decoder: !new:cosyvoice.flow.flow_matching.ConditionalCFM
        in_channels: 240
        cfm_params: !new:omegaconf.DictConfig
            content:
                sigma_min: 1e-06
                solver: 'euler'
                t_scheduler: 'cosine'
                training_cfg_rate: 0.2
                inference_cfg_rate: 0.6
        estimator: !new:cosyvoice.flow.decoder.ConditionalDecoder
            in_channels: 320
            out_channels: 80
            channels: [192, 192]
            dropout: 0.0
            attention_head_dim: 64
            n_blocks: 2
            num_mid_blocks: 10
            num_heads: 6
            act_fn: 'gelu'

hift: !new:cosyvoice.hifigan.generator.HiFTGenerator
    in_channels: 80
    base_channels: 256
    nb_harmonics: 8
    sampling_rate: !ref <sample_rate>
    upsample_rates: [8, 8]
    upsample_kernel_sizes: [16, 16]
    resblock_kernel_sizes: [3, 7, 11]
    resblock_dilation_sizes: [[1, 3, 5], [1, 3, 5], [1, 3, 5]]

get_tokenizer: !name:cosyvoice.tokenizer.tokenizer.get_tokenizer
    multilingual: True
    num_languages: 105
allowed_special: 'all'
feat_extractor: !name:matcha.utils.audio.mel_spectrogram
    n_fft: 1024
    num_mels: 80
    sampling_rate: !ref <sample_rate>
    hop_size: 256
"""


def test_parse_hyperyaml_tags_and_refs():
    y = parse_hyperyaml(YAML_V1)
    assert y["llm"]["__target__"] == "cosyvoice.llm.llm.TransformerLM"
    assert y["llm"]["llm_input_size"] == 1024          # !ref resolved
    assert y["llm"]["text_encoder"]["input_size"] == 512
    assert y["feat_extractor"]["sampling_rate"] == 22050
    assert y["allowed_special"] == "all"


def test_model_config_honors_variant_topology():
    cfg = model_config_from_yaml(YAML_V1)
    # non-default block counts flow straight from yaml
    assert cfg.llm.text_encoder.num_blocks == 3
    assert cfg.llm.llm.num_blocks == 7
    assert cfg.llm.text_encoder.attention_heads == 16
    assert cfg.flow.encoder.num_blocks == 5
    assert cfg.flow.encoder.attention_heads == 4
    assert cfg.flow.estimator.channels == (192, 192)
    assert cfg.flow.estimator.num_mid_blocks == 10
    assert cfg.flow.estimator.num_heads == 6
    assert cfg.flow.cfm.inference_cfg_rate == 0.6
    assert cfg.flow.regulator_stages == 3
    assert cfg.hift.base_channels == 256
    assert cfg.hift.resblock_dilation_sizes == ((1, 3, 5),) * 3
    assert cfg.sample_rate == 22050 and cfg.mel_hop == 256
    # defaults survive where yaml is silent
    assert cfg.llm.llm.input_layer == "linear_legacy"
    assert cfg.flow.estimator.act_fn == "gelu"


def test_inference_config_sampling_knobs():
    icfg = inference_config_from_yaml(YAML_V1)
    assert icfg.sampling_top_p == 0.7
    assert icfg.sampling_top_k == 20
    assert icfg.ras_win_size == 8
    assert icfg.ras_tau_r == 0.2


def test_cv2_configs_from_yaml():
    yaml_v2 = """
sample_rate: 24000
llm: !new:cosyvoice.llm.llm.Qwen2LM
    llm_input_size: 896
    llm_output_size: 896
    speech_token_size: 6561
    mix_ratio: [5, 15]
flow: !new:cosyvoice.flow.flow.CausalMaskedDiffWithXvec
    input_size: 512
    output_size: 80
    vocab_size: 6561
    token_mel_ratio: 2
    pre_lookahead_len: 3
    encoder: !new:cosyvoice.transformer.upsample_encoder.UpsampleConformerEncoder
        output_size: 512
        attention_heads: 8
        linear_units: 2048
        num_blocks: 4
        static_chunk_size: 25
    decoder: !new:cosyvoice.flow.flow_matching.CausalConditionalCFM
        in_channels: 240
        cfm_params: !new:omegaconf.DictConfig
            content:
                sigma_min: 1e-06
                inference_cfg_rate: 0.7
        estimator: !new:cosyvoice.flow.decoder.CausalConditionalDecoder
            in_channels: 320
            out_channels: 80
            channels: [256]
            n_blocks: 4
            num_mid_blocks: 12
            num_heads: 8
hift: !new:cosyvoice.hifigan.generator.HiFTGenerator
    in_channels: 80
    base_channels: 512
    sampling_rate: !ref <sample_rate>
    upsample_rates: [8, 5, 3]
    upsample_kernel_sizes: [16, 11, 7]
"""
    llm_cfg, flow_cfg, hift_cfg, sr = cv2_configs_from_yaml(yaml_v2)
    assert sr == 24000
    assert llm_cfg.mix_ratio == (5, 15)
    assert flow_cfg.encoder.num_blocks == 4
    assert flow_cfg.estimator.channels == (256,)
    assert hift_cfg.upsample_rates == (8, 5, 3)


def test_api_reads_model_dir_yaml(tmp_path, monkeypatch):
    """api.CosyVoice(model_dir) honors a modified yaml without code edits."""
    (tmp_path / "cosyvoice.yaml").write_text(YAML_V1)

    captured = {}

    class FakePipeline:
        def __init__(self, cfg, llm_p, flow_p, hift_p, icfg, **kw):
            captured["cfg"] = cfg
            captured["icfg"] = icfg

    monkeypatch.setattr(api_mod, "load_pretrained",
                        lambda d: {"llm": {}, "flow": {}, "hift": {}})
    monkeypatch.setattr(api_mod, "Frontend", lambda d, sr: object())
    monkeypatch.setattr(api_mod, "TTSPipeline", FakePipeline)

    api = CosyVoice(str(tmp_path))
    assert captured["cfg"].llm.llm.num_blocks == 7
    assert captured["cfg"].flow.estimator.channels == (192, 192)
    assert captured["icfg"].sampling_top_k == 20
    assert api.sample_rate == 22050
