"""CosyVoice API facade — the user-level entry class.

Reference behavior: cosyvoice/cli/cosyvoice.py (CosyVoice): model-dir loading,
speaker registry, and the five inference generators (sft / zero_shot /
cross_lingual / instruct / vc) with per-chunk RTF logging.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Generator, Optional

import numpy as np
import jax

from .config import InferenceConfig, ModelConfig
from .compat.loader import load_pretrained
from .data.frontend import Frontend
from .infer.pipeline import TTSPipeline
from .params import Params


class CosyVoice:
    """TTS API over the cosy_tpu stack (cosyvoice.py:27-139)."""

    def __init__(
        self,
        model_dir: str,
        model_cfg: Optional[ModelConfig] = None,
        infer_cfg: Optional[InferenceConfig] = None,
        finetuned_norm: bool = False,
        seed: int = 0,
    ):
        self.model_dir = model_dir
        yaml_path = os.path.join(model_dir, "cosyvoice.yaml")
        if model_cfg is None and os.path.exists(yaml_path):
            # model-dir topology ingestion (reference cosyvoice.py:35-54):
            # variant num_blocks/heads/channels load without code edits
            from .compat.yaml_config import (
                inference_config_from_yaml, model_config_from_yaml)

            model_cfg = model_config_from_yaml(yaml_path)
            if infer_cfg is None:
                infer_cfg = inference_config_from_yaml(yaml_path)
        self.cfg = model_cfg or ModelConfig()
        self.sample_rate = self.cfg.sample_rate
        params = load_pretrained(model_dir)
        self.frontend = Frontend(model_dir, self.sample_rate)
        self.model = TTSPipeline(
            self.cfg, params["llm"], params["flow"], params["hift"],
            infer_cfg or InferenceConfig(), finetuned_norm=finetuned_norm)
        self._rng = jax.random.PRNGKey(seed)
        self._n = 0

    # ------------------------------------------------------------------

    def _next_rng(self):
        self._n += 1
        return jax.random.fold_in(self._rng, self._n)

    def list_available_spks(self):
        return list(self.frontend.spk2info.keys())

    def add_zero_shot_spk(self, prompt_text: str, prompt_speech_16k: np.ndarray,
                          zero_shot_spk_id: str) -> bool:
        assert zero_shot_spk_id != "", "do not use empty zero_shot_spk_id"
        model_input = self.frontend.frontend_zero_shot(
            "", prompt_text, prompt_speech_16k, "")
        model_input.pop("text", None)
        self.frontend.spk2info[zero_shot_spk_id] = model_input
        return True

    def save_spkinfo(self):
        import torch

        blob = {k: {kk: torch.from_numpy(np.asarray(vv)) if isinstance(vv, np.ndarray) else vv
                    for kk, vv in v.items()}
                for k, v in self.frontend.spk2info.items()}
        torch.save(blob, os.path.join(self.model_dir, "spk2info.pt"))

    # ------------------------------------------------------------------

    def _run(self, model_input: dict, stream: bool, speed: float
             ) -> Generator[dict, None, None]:
        start = time.time()
        kwargs = dict(
            text_tokens=model_input.get("text"),
            prompt_text=model_input.get("prompt_text"),
            prompt_feat=model_input.get("prompt_speech_feat"),
            llm_prompt_speech_token=model_input.get("llm_prompt_speech_token"),
            flow_prompt_speech_token=model_input.get("flow_prompt_speech_token"),
            llm_embedding=model_input.get("llm_embedding"),
            flow_embedding=model_input.get("flow_embedding"),
            source_speech_token=model_input.get("source_speech_token"),
        )
        for out in self.model.synthesize(self._next_rng(), stream=stream,
                                         speed=speed, **kwargs):
            n = out["tts_speech"].shape[1] / self.sample_rate
            logging.info("yield speech len %.2f, rtf %.3f", n,
                         (time.time() - start) / max(n, 1e-6))
            yield out
            start = time.time()

    def inference_sft(self, tts_text: str, spk_id: str, stream: bool = False,
                      speed: float = 1.0, text_frontend: bool = True):
        for seg in self.frontend.normalize(tts_text, split=True,
                                           text_frontend=text_frontend):
            yield from self._run(self.frontend.frontend_sft(seg, spk_id), stream, speed)

    def inference_zero_shot(self, tts_text: str, prompt_text: str,
                            prompt_speech_16k: np.ndarray, zero_shot_spk_id: str = "",
                            stream: bool = False, speed: float = 1.0,
                            text_frontend: bool = True):
        prompt_text = self.frontend.normalize(prompt_text, split=False,
                                              text_frontend=text_frontend)
        for seg in self.frontend.normalize(tts_text, split=True,
                                           text_frontend=text_frontend):
            if len(seg) < 0.5 * len(prompt_text):
                logging.warning("synthesis text %s too short vs prompt %s", seg, prompt_text)
            model_input = self.frontend.frontend_zero_shot(
                seg, prompt_text, prompt_speech_16k, zero_shot_spk_id)
            yield from self._run(model_input, stream, speed)

    def inference_cross_lingual(self, tts_text: str, prompt_speech_16k: np.ndarray,
                                zero_shot_spk_id: str = "", stream: bool = False,
                                speed: float = 1.0, text_frontend: bool = True):
        for seg in self.frontend.normalize(tts_text, split=True,
                                           text_frontend=text_frontend):
            model_input = self.frontend.frontend_cross_lingual(
                seg, prompt_speech_16k, zero_shot_spk_id)
            yield from self._run(model_input, stream, speed)

    def inference_instruct(self, tts_text: str, spk_id: str, instruct_text: str,
                           stream: bool = False, speed: float = 1.0,
                           text_frontend: bool = True):
        instruct_text = self.frontend.normalize(instruct_text, split=False,
                                                text_frontend=text_frontend)
        for seg in self.frontend.normalize(tts_text, split=True,
                                           text_frontend=text_frontend):
            model_input = self.frontend.frontend_instruct(seg, spk_id, instruct_text)
            yield from self._run(model_input, stream, speed)

    def inference_vc(self, source_speech_16k: np.ndarray,
                     prompt_speech_16k: np.ndarray, stream: bool = False,
                     speed: float = 1.0):
        model_input = self.frontend.frontend_vc(source_speech_16k, prompt_speech_16k)
        yield from self._run(model_input, stream, speed)


class CosyVoice2(CosyVoice):
    """CosyVoice2 API: Qwen2LM + causal streaming flow at 24 kHz
    (reference: cosyvoice.py:142-194).  ``inference_instruct`` is replaced by
    ``inference_instruct2`` (natural-language instruction + voice prompt)."""

    def __init__(
        self,
        model_dir: str,
        llm_cfg=None,
        flow_cfg=None,
        hift_cfg=None,
        infer_cfg: Optional[InferenceConfig] = None,
        seed: int = 0,
    ):
        from .models.qwen2lm import Qwen2LMConfig
        from .models.flow2 import Flow2Config
        from .config import HiFTConfig
        from .infer.pipeline2 import TTS2Pipeline

        self.model_dir = model_dir
        self.sample_rate = 24000
        yaml_path = os.path.join(model_dir, "cosyvoice.yaml")
        if llm_cfg is None and flow_cfg is None and hift_cfg is None \
                and os.path.exists(yaml_path):
            from .compat.yaml_config import cv2_configs_from_yaml

            llm_cfg, flow_cfg, hift_cfg, self.sample_rate = \
                cv2_configs_from_yaml(yaml_path)
        llm_cfg = llm_cfg or Qwen2LMConfig()
        flow_cfg = flow_cfg or Flow2Config()
        hift_cfg = hift_cfg or HiFTConfig(sampling_rate=24000, upsample_rates=(8, 5, 3),
                                          upsample_kernel_sizes=(16, 11, 7))
        params = load_pretrained(model_dir)
        self.frontend = Frontend(model_dir, self.sample_rate)
        self.model = TTS2Pipeline(llm_cfg, flow_cfg, hift_cfg, params["llm"],
                                  params["flow"], params["hift"],
                                  infer_cfg or InferenceConfig(), hop_samples=480)
        self._rng = jax.random.PRNGKey(seed)
        self._n = 0

    def _run(self, model_input: dict, stream: bool, speed: float):
        start = time.time()
        kwargs = dict(
            text_tokens=model_input.get("text"),
            prompt_text=model_input.get("prompt_text"),
            prompt_feat=model_input.get("prompt_speech_feat"),
            llm_prompt_speech_token=model_input.get("llm_prompt_speech_token"),
            flow_prompt_speech_token=model_input.get("flow_prompt_speech_token"),
            flow_embedding=model_input.get("flow_embedding"),
            source_speech_token=model_input.get("source_speech_token"),
        )
        for out in self.model.synthesize(self._next_rng(), stream=stream,
                                         speed=speed, **kwargs):
            n = out["tts_speech"].shape[1] / self.sample_rate
            logging.info("yield speech len %.2f, rtf %.3f", n,
                         (time.time() - start) / max(n, 1e-6))
            yield out
            start = time.time()

    def inference_instruct(self, *a, **kw):
        raise NotImplementedError("inference_instruct is CosyVoice(1); use "
                                  "inference_instruct2 (cosyvoice.py:186 semantics)")

    def inference_instruct2(self, tts_text: str, instruct_text: str,
                            prompt_speech_16k: np.ndarray, zero_shot_spk_id: str = "",
                            stream: bool = False, speed: float = 1.0,
                            text_frontend: bool = True):
        for seg in self.frontend.normalize(tts_text, split=True,
                                           text_frontend=text_frontend):
            model_input = self.frontend.frontend_zero_shot(
                seg, instruct_text + "<|endofprompt|>", prompt_speech_16k, zero_shot_spk_id)
            # instruct2: no speech-token prompt on the LLM side (frontend.py:240-244)
            model_input.pop("llm_prompt_speech_token", None)
            yield from self._run(model_input, stream, speed)
