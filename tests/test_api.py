"""CosyVoice API facade tests over tiny random-weight models."""

import numpy as np
import jax
import pytest

from cosy_tpu.api import CosyVoice
from cosy_tpu.config import InferenceConfig
from cosy_tpu.data.frontend import Frontend
from cosy_tpu.infer.pipeline import TTSPipeline
from cosy_tpu.models import flow as F, llm as L

from test_pipeline import MODEL_CFG, init_hift_params


def _make_api(monkeypatch_dir=None) -> CosyVoice:
    api = CosyVoice.__new__(CosyVoice)
    api.model_dir = "/tmp/fake"
    api.cfg = MODEL_CFG
    api.sample_rate = MODEL_CFG.sample_rate
    key = jax.random.PRNGKey(0)
    api.frontend = Frontend(None, MODEL_CFG.sample_rate)
    api.model = TTSPipeline(
        MODEL_CFG,
        L.init_llm_params(jax.random.fold_in(key, 1), MODEL_CFG.llm),
        F.init_flow_params(jax.random.fold_in(key, 2), MODEL_CFG.flow),
        init_hift_params(jax.random.fold_in(key, 3), MODEL_CFG.hift),
        InferenceConfig(),
        finetuned_norm=True,
    )
    api._rng = jax.random.PRNGKey(0)
    api._n = 0
    return api


@pytest.fixture(scope="module")
def api():
    return _make_api()


def _tok(api, text):  # tiny models have text_token_size 40 — remap byte tokens
    ids = api.frontend.extract_text_token(text)
    return ids % 40


def test_zero_shot_inference(api):
    rng = np.random.default_rng(0)
    prompt_16k = rng.uniform(-0.3, 0.3, 16000).astype(np.float32)
    model_input = api.frontend.frontend_zero_shot("hi there.", "hello.", prompt_16k)
    for k in ("text", "prompt_text", "llm_prompt_speech_token",
              "flow_prompt_speech_token", "prompt_speech_feat",
              "llm_embedding", "flow_embedding"):
        assert k in model_input, k
    # speech feat has the right mel geometry
    assert model_input["prompt_speech_feat"].shape[-1] == 80
    model_input["text"] = model_input["text"] % 40
    model_input["prompt_text"] = model_input["prompt_text"] % 40
    model_input["llm_prompt_speech_token"] = model_input["llm_prompt_speech_token"] % 30
    model_input["flow_prompt_speech_token"] = model_input["flow_prompt_speech_token"] % 30
    model_input["llm_embedding"] = model_input["llm_embedding"][:, :12]
    model_input["flow_embedding"] = model_input["flow_embedding"][:, :12]
    outs = list(api._run(model_input, stream=False, speed=1.0))
    assert len(outs) == 1
    assert np.isfinite(outs[0]["tts_speech"]).all()


def test_vc_inference(api):
    rng = np.random.default_rng(1)
    src = rng.uniform(-0.3, 0.3, 16000).astype(np.float32)
    prm = rng.uniform(-0.3, 0.3, 16000).astype(np.float32)
    model_input = api.frontend.frontend_vc(src, prm)
    assert "source_speech_token" in model_input
    model_input["source_speech_token"] = model_input["source_speech_token"][:, :20] % 30
    model_input["flow_prompt_speech_token"] = model_input["flow_prompt_speech_token"][:, :10] % 30
    model_input["flow_embedding"] = model_input["flow_embedding"][:, :12]
    model_input["prompt_speech_feat"] = model_input["prompt_speech_feat"][:, :16]
    outs = list(api._run(model_input, stream=False, speed=1.0))
    # VC bypasses the LLM: 20 source tokens -> 34 mel frames -> 34*256 samples
    assert outs[0]["tts_speech"].shape[1] > 0


def test_instruct_omits_llm_speaker_row(api):
    api.frontend.spk2info["spk_a"] = {"embedding": np.random.default_rng(2).standard_normal((1, 12)).astype(np.float32)}
    model_input = api.frontend.frontend_instruct("good day.", "spk_a", "speak slowly")
    assert "llm_embedding" not in model_input
    assert "flow_embedding" in model_input
    assert model_input["prompt_text"].size > 0


def test_spk_registry(api):
    api.frontend.spk2info["demo"] = {"embedding": np.zeros((1, 12), np.float32)}
    assert "demo" in api.list_available_spks()


def test_text_normalize_split(api):
    segs = api.frontend.normalize("今天天气很好。我们一起去公园散步吧！", split=True)
    assert len(segs) >= 1
    assert all(isinstance(s, str) and s for s in segs)
