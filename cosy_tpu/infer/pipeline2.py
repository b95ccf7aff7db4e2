"""CosyVoice2 TTS pipeline: Qwen2LM -> causal flow -> HiFT.

Reference behavior: cosyvoice/cli/model.py:291-437 (CosyVoice2Model): 25-token
hops, token-offset mel trimming (token_mel_ratio 2), HiFT mel/source/speech
caches (mel_cache_len 8, source cache 8*480), no flow z/mu cache (the causal
flow uses the fixed seeded noise buffer instead).

Note CosyVoice2 runs at 24 kHz with hop 480 — sample-rate plumbing is carried
by the configs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import InferenceConfig
from ..ctx import EVAL
from ..params import P, Params
from ..utils.aot import aot_jit as _aot_jit_base
from ..layers.basic import embedding
from ..models.flow2 import Flow2Config, flow2_inference
from ..models.qwen2lm import (Qwen2LMConfig, qwen2lm_decode,
                              qwen2lm_decode_batch)
from ..models import hift as H
from ..config import HiFTConfig
from .pipeline import (_batch_prefixes, _cap_bucket, attend_rung, fade_in_out,
                       fade_in_out_jnp)


@dataclasses.dataclass
class Stream2State:
    hift_mel: Optional[np.ndarray] = None
    hift_source: Optional[np.ndarray] = None
    hift_speech: Optional[np.ndarray] = None


class TTS2Pipeline:
    def __init__(
        self,
        llm_cfg: Qwen2LMConfig,
        flow_cfg: Flow2Config,
        hift_cfg: HiFTConfig,
        llm_params: Params,
        flow_params: Params,
        hift_params: Params,
        infer_cfg: InferenceConfig = InferenceConfig(),
        hop_samples: int = 480,
    ):
        self.lcfg = llm_cfg
        self.fcfg = flow_cfg
        self.hcfg = hift_cfg
        if infer_cfg.int8_decode:
            # weight-only int8 for the Qwen2 projections: halves the
            # per-token weight read that bounds bs=1 decode (quant.py)
            from ..quant import quantize_int8

            llm_params = quantize_int8(llm_params)
        self.llm_params = llm_params
        self.flow_params = flow_params
        self.hift_params = hift_params
        self.icfg = infer_cfg
        self.token_hop_len = 25  # model.py:307 — must match training chunks
        self.mel_cache_len = 8
        self.hop_samples = hop_samples
        self.source_cache_len = self.mel_cache_len * hop_samples
        self.speech_window = np.hamming(2 * self.source_cache_len)
        # bucketed final chunk: static un-emitted window width (the streaming
        # loops leave < hop + lookahead un-emitted tokens for the final)
        self._final_out_tokens = -(-(self.token_hop_len +
                                     flow_cfg.pre_lookahead_len) // 32) * 32

        # AOT-cache salt (utils/aot.py): everything the jit closures bake in
        # that the abstract arg signature cannot see — a config flip must
        # produce a different cache key, never a stale executable
        import os as _os

        def _salt():
            return "|".join(
                [repr(self.lcfg), repr(self.fcfg), repr(self.hcfg),
                 repr(self.icfg)]
                + [f"{k}={_os.environ.get(k)}" for k in (
                    "COSY_TPU_ATTN_WINDOW", "COSY_TPU_FLASH",
                    "COSY_TPU_FUSED_BLOCK", "COSY_TPU_HIFT_GEMM",
                    "COSY_TPU_FLASH_MIN_T")])

        def _ajit(fn, static_argnames=(), name=None):
            return _aot_jit_base(fn, static_argnames=static_argnames,
                                 name=name, salt=_salt)

        # jitted stages (eager = per-op RPC on remote TPU runtimes; one
        # program per shape bucket instead — see pipeline.py)
        def _flow_fn(params, token, prompt_token, prompt_feat, spk, *,
                     streaming, finalize, n_timesteps):
            return flow2_inference(
                P(params), self.fcfg, token, prompt_token, prompt_feat, spk,
                streaming=streaming, finalize=finalize, n_timesteps=n_timesteps,
                sampler=self.icfg.sampler)

        self._flow_jit = _ajit(
            _flow_fn, static_argnames=("streaming", "finalize", "n_timesteps"))

        def _hift_fn(params, rng, mel, cache_source):
            return H.hift_inference(P(params), self.hcfg, rng, mel, cache_source)

        self._hift_jit = _ajit(_hift_fn)

        # LM-prefix pack as one program (pipeline.py learned this the hard
        # way — PERF.md "v1 streaming TTFA decomposition"; here the pack is
        # only embedding gathers + concat, but eagerly that is still 4-6
        # per-op RPCs ≈ 100+ ms of TTFA per request through a remote runtime)
        def _prefix_fn(params, tt, pst):
            p = P(params)
            parts = [params["llm_embedding.weight"][self.lcfg.sos_eos][None, None],
                     embedding(p.sub("llm.model.model"), "embed_tokens", tt),
                     params["llm_embedding.weight"][self.lcfg.task_id][None, None]]
            if pst is not None:
                pse = embedding(p, "speech_embedding", pst)
                parts.append(pse.reshape(1, -1, self.lcfg.llm_input_size))
            return jnp.concatenate(parts, axis=1)

        self._prefix_jit = _ajit(_prefix_fn)

        # fused non-streaming token2wav (flow + trim + HiFT in one program —
        # saves a host round-trip per request; see pipeline.py)
        def _t2w_fn(flow_p, hift_p, rng, token, prompt_token, prompt_feat, spk,
                    *, offset, n_timesteps):
            mel = flow2_inference(
                P(flow_p), self.fcfg, token, prompt_token, prompt_feat, spk,
                streaming=False, finalize=True, n_timesteps=n_timesteps,
                sampler=self.icfg.sampler)
            if offset > 0:
                mel = mel[:, :, offset * self.fcfg.token_mel_ratio:]
            wav, _ = H.hift_inference(P(hift_p), self.hcfg, rng, mel, None)
            return wav

        self._t2w_jit = _ajit(_t2w_fn, static_argnames=("offset", "n_timesteps"))

        # fused STREAMING chunk (non-final): causal flow + offset trim +
        # HiFT caches/fade in one program (see pipeline.py _t2w_stream_jit;
        # CosyVoice2 has no mel-overlap fade or flow z/mu cache — the fixed
        # seeded noise buffer provides stream consistency instead)
        def _t2w_stream_fn(flow_p, hift_p, rng, token, prompt_token,
                           prompt_feat, spk, hift_mel, hift_source,
                           hift_speech, *, offset, streaming, n_timesteps):
            mel = flow2_inference(
                P(flow_p), self.fcfg, token, prompt_token, prompt_feat, spk,
                streaming=streaming, finalize=False, n_timesteps=n_timesteps,
                sampler=self.icfg.sampler)
            if offset > 0:
                mel = mel[:, :, offset * self.fcfg.token_mel_ratio:]
            if hift_mel.shape[2]:
                mel = jnp.concatenate([hift_mel, mel], axis=2)
            wav, source = H.hift_inference(
                P(hift_p), self.hcfg, rng, mel,
                hift_source if hift_source.shape[2] else None)
            if hift_speech.shape[1]:
                wav = fade_in_out_jnp(wav, hift_speech, self.speech_window)
            new_mel = mel[:, :, -self.mel_cache_len:]
            new_source = source[:, :, -self.source_cache_len:]
            new_speech = wav[:, -self.source_cache_len:]
            return (wav[:, : -self.source_cache_len], new_mel, new_source,
                    new_speech)

        self._t2w_stream_jit = _ajit(
            _t2w_stream_fn, static_argnames=("offset", "streaming", "n_timesteps"))

        # bucketed FINAL chunk (prompt-free): the final window is the FULL
        # cumulative token stream at a data-dependent length and offset, so
        # the staged path compiles one program per (length, offset) pair —
        # unbounded in serving.  This program pads tokens to a static bucket,
        # takes the true length and emitted-offset as traced scalars, and
        # dynamic-slices the un-emitted mel window (static out_tokens width).
        # BIT-exact vs the unpadded program: causal estimator + fixed seeded
        # noise (see flow2_inference token_valid).
        def _t2w_final_fn(flow_p, hift_p, rng, token, tok_valid, off_tok, spk,
                          hift_mel, hift_source, hift_speech, *, out_tokens,
                          n_timesteps):
            r = self.fcfg.token_mel_ratio
            mel = flow2_inference(
                P(flow_p), self.fcfg, token, jnp.zeros((1, 0), jnp.int32),
                jnp.zeros((1, 0, 80)), spk, streaming=False, finalize=True,
                n_timesteps=n_timesteps, token_valid=tok_valid,
                sampler=self.icfg.sampler)
            # un-emitted window [off*r, off*r + out_tokens*r) — pad so the
            # traced start never clamps
            mel = jnp.pad(mel, ((0, 0), (0, 0), (0, out_tokens * r)))
            melw = jax.lax.dynamic_slice_in_dim(mel, off_tok * r,
                                                out_tokens * r, axis=2)
            hift_valid = (tok_valid - off_tok) * r
            if hift_mel.shape[2]:
                melw = jnp.concatenate([hift_mel, melw], axis=2)
                hift_valid = hift_valid + hift_mel.shape[2]
            wav, _ = H.hift_inference(
                P(hift_p), self.hcfg, rng, melw,
                hift_source if hift_source.shape[2] else None,
                mel_valid=hift_valid)
            if hift_speech.shape[1]:
                wav = fade_in_out_jnp(wav, hift_speech, self.speech_window)
            return wav  # callers slice [:, :hift_valid * hop_samples]

        self._t2w_final_jit = _ajit(
            _t2w_final_fn, static_argnames=("out_tokens", "n_timesteps"))

        def _decode_fn(params, rng, prefix, min_len, cap, *, max_len, top_p,
                       top_k, win_size, tau_r):
            # cap = the request's true stop bound (traced); max_len = the
            # bucketed static capacity
            return qwen2lm_decode(P(params), self.lcfg, rng, prefix, min_len,
                                  max_len, top_p=top_p, top_k=top_k,
                                  win_size=win_size, tau_r=tau_r, stop_at=cap)

        self._decode_jit = _ajit(
            _decode_fn, static_argnames=("max_len", "top_p", "top_k",
                                         "win_size", "tau_r"))

        def _decode_seg_fn(params, rng, prefix, min_len, stop_at, state, *,
                           max_len, top_p, top_k, win_size, tau_r):
            return qwen2lm_decode(P(params), self.lcfg, rng, prefix, min_len,
                                  max_len, top_p=top_p, top_k=top_k,
                                  win_size=win_size, tau_r=tau_r,
                                  stop_at=stop_at, state=state,
                                  return_state=True)

        self._decode_seg_jit = _ajit(
            _decode_seg_fn, static_argnames=("max_len", "top_p", "top_k",
                                             "win_size", "tau_r"))

        def _decode_batch_fn(params, rng, prefix, valid, min_lens, max_lens, *,
                             max_len):
            return qwen2lm_decode_batch(
                P(params), self.lcfg, rng, prefix, valid, min_lens, max_len,
                top_p=self.icfg.sampling_top_p, top_k=self.icfg.sampling_top_k,
                win_size=self.icfg.ras_win_size, tau_r=self.icfg.ras_tau_r,
                max_lens=max_lens)

        self._decode_batch_jit = _ajit(_decode_batch_fn,
                                         static_argnames=("max_len",))

        # segment-wise batched decode for streaming cohorts
        def _decode_batch_seg_fn(params, rng, prefix, valid, min_lens,
                                 max_lens, stop_at, state, *, max_len,
                                 attend_width=None):
            return qwen2lm_decode_batch(
                P(params), self.lcfg, rng, prefix, valid, min_lens, max_len,
                top_p=self.icfg.sampling_top_p, top_k=self.icfg.sampling_top_k,
                win_size=self.icfg.ras_win_size, tau_r=self.icfg.ras_tau_r,
                max_lens=max_lens, stop_at=stop_at, state=state,
                return_state=True, attend_width=attend_width)

        self._decode_batch_seg_jit = _ajit(
            _decode_batch_seg_fn,
            static_argnames=("max_len", "attend_width"))

        # continuous-batching slot admission (infer/engine.py)
        def _admit_fn(params, state, prefix, valid, rng_req, slot, cap,
                      min_len_req):
            from ..models.qwen2lm import qwen2lm_admit_slot

            return qwen2lm_admit_slot(
                P(params), self.lcfg, state, prefix, valid, rng_req, slot,
                cap, min_len_req, top_p=self.icfg.sampling_top_p,
                top_k=self.icfg.sampling_top_k,
                win_size=self.icfg.ras_win_size, tau_r=self.icfg.ras_tau_r)

        self._admit_jit = _ajit(_admit_fn)

    # ------------------------------------------------------------------

    def _build_prefix(self, text_tokens, prompt_text, prompt_speech_token,
                      max_len_cap):
        tt = np.asarray(text_tokens)
        if prompt_text is not None and prompt_text.size:
            tt = np.concatenate([np.asarray(prompt_text), tt], axis=1)
        prompt_text_len = prompt_text.shape[1] if prompt_text is not None else 0

        pst = None
        if prompt_speech_token is not None and np.asarray(prompt_speech_token).size:
            pst = jnp.asarray(prompt_speech_token, jnp.int32)
        prefix = self._prefix_jit(self.llm_params, jnp.asarray(tt, jnp.int32), pst)

        target_text = tt.shape[1] - prompt_text_len
        min_len = int(target_text * self.icfg.min_token_text_ratio)
        # the TRUE per-request cap (llm.py:180); consumers bucket the static
        # capacity via _cap_bucket and enforce this cap as a traced stop
        max_len = min(int(target_text * self.icfg.max_token_text_ratio), max_len_cap)
        return prefix, min_len, max_len

    def generate_tokens(
        self,
        rng: jax.Array,
        text_tokens: np.ndarray,
        prompt_text: Optional[np.ndarray] = None,
        prompt_speech_token: Optional[np.ndarray] = None,
        max_len_cap: int = 2048,
    ) -> np.ndarray:
        """[sos, text, task, prompt_speech] prefix -> while-loop decode
        (llm.py:427-462; no speaker row in CosyVoice2)."""
        prefix, min_len, max_len = self._build_prefix(
            text_tokens, prompt_text, prompt_speech_token, max_len_cap)
        res = self._decode_jit(
            self.llm_params, rng, prefix, jnp.asarray(min_len),
            jnp.asarray(max_len), max_len=_cap_bucket(max_len),
            top_p=self.icfg.sampling_top_p, top_k=self.icfg.sampling_top_k,
            win_size=self.icfg.ras_win_size, tau_r=self.icfg.ras_tau_r)
        n = int(res.length)
        return np.asarray(res.tokens)[None, :n]

    def generate_tokens_stream(
        self,
        rng: jax.Array,
        text_tokens: np.ndarray,
        prompt_text: Optional[np.ndarray] = None,
        prompt_speech_token: Optional[np.ndarray] = None,
        max_len_cap: int = 2048,
        seg_tokens: Optional[int] = None,
    ):
        """Incremental producer yielding (tokens_so_far, done) per decode
        segment; bit-identical to generate_tokens (llm_job equivalent,
        model.py:307-335).  ``stop_at`` bounds decode *attempts* — fill
        tokens are skipped without storing, so a segment may deliver fewer
        than seg_tokens net tokens; the consumer just asks again."""
        prefix, min_len, max_len = self._build_prefix(
            text_tokens, prompt_text, prompt_speech_token, max_len_cap)
        kw = dict(max_len=_cap_bucket(max_len),
                  top_p=self.icfg.sampling_top_p, top_k=self.icfg.sampling_top_k,
                  win_size=self.icfg.ras_win_size, tau_r=self.icfg.ras_tau_r)
        seg = seg_tokens or (2 * self.token_hop_len)
        target = min(seg, max_len)  # targets bound by the TRUE request cap
        pending = self._decode_seg_jit(
            self.llm_params, rng, prefix, jnp.asarray(min_len),
            jnp.asarray(target), None, **kw)
        while True:
            res, state = pending
            # prefetch: submit segment k+1 before syncing segment k (pure
            # dispatch pipelining, bit-identical streams — see pipeline.py)
            next_target = min(target + seg, max_len)
            if next_target > target:
                pending = self._decode_seg_jit(
                    self.llm_params, rng, prefix, jnp.asarray(min_len),
                    jnp.asarray(next_target), state, **kw)
            n = int(res.length)
            done = bool(np.asarray(state[-1])) or int(np.asarray(state[0])) >= max_len
            yield np.asarray(res.tokens)[None, :n], done
            if done:
                return
            target = next_target

    # ------------------------------------------------------------------

    def synthesize_batch(
        self,
        rng: jax.Array,
        text_tokens_list,  # list of (1, Tt) arrays
        spk_embeddings=None,  # list of (1, spk_dim) or None
        speed=1.0,  # float or per-request list
        max_len_cap: int = 2048,
    ):
        """Micro-batched non-streaming CosyVoice2 synthesis (serving): one
        qwen2lm_decode_batch over left-padded prefixes, then causal flow +
        vocoder per request.  Returns a list of (1, n) wavs."""
        B = len(text_tokens_list)
        if spk_embeddings is None:
            spk_embeddings = [None] * B
        speeds = list(speed) if isinstance(speed, (list, tuple)) else [speed] * B
        built = [self._build_prefix(t, None, None, max_len_cap)
                 for t in text_tokens_list]
        prefix, valid, min_lens, max_lens, max_len = _batch_prefixes(built)

        k_llm, k_wav = jax.random.split(rng)
        res = self._decode_batch_jit(
            self.llm_params, k_llm, prefix, valid, min_lens, max_lens,
            max_len=max_len)
        # dispatch all fused token2wav programs before syncing any (the
        # host round-trips overlap with device execution)
        futs = []
        for b in range(B):
            n = int(res.lengths[b])
            tokens = np.asarray(res.tokens[b])[None, :n]
            spk = (np.zeros((1, self.fcfg.spk_embed_dim), np.float32)
                   if spk_embeddings[b] is None else np.asarray(spk_embeddings[b]))
            rng_b = jax.random.fold_in(k_wav, b)
            fut = self._token2wav_fused(
                rng_b, tokens, np.zeros((1, 0), np.int32),
                np.zeros((1, 0, 80), np.float32), spk, 0, None, False, True,
                speeds[b])
            futs.append((fut, rng_b, tokens, spk, speeds[b]))
        wavs = []
        for fut, rng_b, tokens, spk, sp in futs:
            if fut is not None:
                wavs.append(np.asarray(fut))
            else:
                wav, _ = self.token2wav(rng_b, tokens, None, None, spk,
                                        token_offset=0, finalize=True, speed=sp)
                wavs.append(wav)
        return wavs

    def _nfe(self) -> int:
        """Fixed NFE (reference flow.py: n_timesteps=10) — or the distilled
        few-step count under the MeanFlow sampler (train/distill.py)."""
        return (self.icfg.meanflow_steps if self.icfg.sampler == "meanflow"
                else self.icfg.nfe_short)

    def _token2wav_fused(self, rng, token, prompt_token, prompt_feat,
                         spk_embedding, token_offset, state, stream, finalize,
                         speed):
        """Dispatch the one-program token2wav when the host stages between
        flow and HiFT are no-ops (no stream carries, finalize, natural
        speed).  Returns the un-synced device array or None."""
        carries = state is not None and (
            state.hift_mel is not None or state.hift_speech is not None)
        if not (finalize and not stream and not carries and speed == 1.0):
            return None
        return self._t2w_jit(
            self.flow_params, self.hift_params, rng,
            jnp.asarray(token, jnp.int32), jnp.asarray(prompt_token, jnp.int32),
            jnp.asarray(prompt_feat), jnp.asarray(spk_embedding),
            offset=token_offset, n_timesteps=self._nfe())

    def synthesize_stream_batch(
        self,
        rng: jax.Array,
        text_tokens_list,  # list of (1, Tt) arrays
        spk_embeddings=None,  # list of (1, spk_dim) or None
        max_len_cap: int = 2048,
    ):
        """Batched streaming CosyVoice2 synthesis: one lock-step segmented
        decode across concurrent streams (see pipeline.py
        synthesize_stream_batch), 25-token hops with pre-lookahead per
        stream.  Yields (request_index, wav (1, n), done)."""
        B = len(text_tokens_list)
        if spk_embeddings is None:
            spk_embeddings = [None] * B
        built = [self._build_prefix(t, None, None, max_len_cap)
                 for t in text_tokens_list]
        prefix, valid, min_lens, max_lens, max_len = _batch_prefixes(built)

        k_llm, k_wav = jax.random.split(rng)
        spks = [np.zeros((1, self.fcfg.spk_embed_dim), np.float32)
                if s is None else np.asarray(s) for s in spk_embeddings]

        hop = self.token_hop_len
        seg = 2 * hop
        states = [Stream2State() for _ in range(B)]
        offsets = [0] * B
        ki = [0] * B
        finished = [False] * B
        dstate = None
        target = min(seg, max_len)
        while not all(finished):
            res, dstate = self._decode_batch_seg_jit(
                self.llm_params, k_llm, prefix, valid, min_lens, max_lens,
                jnp.asarray(target), dstate, max_len=max_len,
                attend_width=attend_rung(prefix.shape[1], target, max_len))
            lengths = np.asarray(res.lengths)
            done_dev = np.asarray(dstate.done)
            all_tokens = np.asarray(res.tokens)
            cohort_done = bool(done_dev.all()) or int(np.asarray(dstate.i)) >= max_len
            for b in range(B):
                if finished[b]:
                    continue
                n = int(lengths[b])
                stream_done = bool(done_dev[b]) or cohort_done
                while n >= offsets[b] + hop + self.fcfg.pre_lookahead_len:
                    window = all_tokens[b][None, : offsets[b] + hop + self.fcfg.pre_lookahead_len]
                    wav, states[b] = self.token2wav(
                        jax.random.fold_in(jax.random.fold_in(k_wav, b), ki[b]),
                        window, None, None, spks[b], offsets[b], states[b],
                        stream=True, finalize=False)
                    yield b, wav, False
                    offsets[b] += hop
                    ki[b] += 1
                if stream_done:
                    window = all_tokens[b][None, :n]
                    wav, _ = self.token2wav(
                        jax.random.fold_in(jax.random.fold_in(k_wav, b), ki[b]),
                        window, None, None, spks[b], offsets[b], states[b],
                        finalize=True)
                    finished[b] = True
                    yield b, wav, True
            target = min(target + seg, max_len)

    def _token2wav_stream_fused(self, rng, token, prompt_token, prompt_feat,
                                spk_embedding, token_offset, state, stream,
                                finalize, speed):
        """One-program streaming chunk (non-final; see _t2w_stream_jit).
        Returns (wav, updated state) or None for the staged path."""
        if not (state is not None and not finalize and speed == 1.0):
            return None

        def _or_empty(x, *shape):
            return np.asarray(x) if x is not None else np.zeros(shape, np.float32)

        out = self._t2w_stream_jit(
            self.flow_params, self.hift_params, rng,
            jnp.asarray(token, jnp.int32), jnp.asarray(prompt_token, jnp.int32),
            jnp.asarray(prompt_feat), jnp.asarray(spk_embedding),
            jnp.asarray(_or_empty(state.hift_mel, 1, 80, 0)),
            jnp.asarray(_or_empty(state.hift_source, 1, 1, 0)),
            jnp.asarray(_or_empty(state.hift_speech, 1, 0)),
            offset=token_offset, streaming=stream,
            n_timesteps=self._nfe())
        wav, hm, hs, hsp = out
        state.hift_mel = np.asarray(hm)
        state.hift_source = np.asarray(hs)
        state.hift_speech = np.asarray(hsp)
        return np.asarray(wav), state

    def token2wav(
        self,
        rng: jax.Array,
        token: np.ndarray,
        prompt_token: Optional[np.ndarray],
        prompt_feat: Optional[np.ndarray],
        spk_embedding: np.ndarray,
        token_offset: int,
        state: Optional[Stream2State] = None,
        stream: bool = False,
        finalize: bool = True,
        speed: float = 1.0,
        sync: bool = True,
    ) -> Tuple[np.ndarray, Optional[Stream2State]]:
        """model.py:336-370.

        ``sync=False`` (fused non-streaming path only) returns the un-synced
        device array so callers can pipeline independent requests — see
        pipeline.TTSPipeline.token2wav.
        """
        if speed != 1.0 and (stream or (state is not None and state.hift_mel is not None)):
            # reference model.py:364-365: speed change only in non-stream mode
            raise ValueError("speed change only supports non-stream inference mode")
        prompt_token = prompt_token if prompt_token is not None else np.zeros((1, 0), np.int32)
        prompt_feat = prompt_feat if prompt_feat is not None else np.zeros((1, 0, 80), np.float32)

        # bucketed FINAL chunk (streaming context, state given): one program
        # per token bucket serves every (length, offset) pair — the fused and
        # staged paths below compile one program per pair, which is unbounded
        # in serving
        if (self.icfg.bucket_final and state is not None and finalize
                and speed == 1.0 and prompt_token.shape[1] == 0
                and prompt_feat.shape[1] == 0
                and 0 < token.shape[1] - token_offset <= self._final_out_tokens):
            return self._token2wav_final_bucketed(
                rng, token, spk_embedding, token_offset, state, sync)

        fut = self._token2wav_fused(rng, token, prompt_token, prompt_feat,
                                    spk_embedding, token_offset, state,
                                    stream, finalize, speed)
        if fut is not None:
            return (fut if not sync else np.asarray(fut)), None
        sres = self._token2wav_stream_fused(rng, token, prompt_token,
                                            prompt_feat, spk_embedding,
                                            token_offset, state, stream,
                                            finalize, speed)
        if sres is not None:
            return sres

        mel = self._flow_jit(
            self.flow_params,
            jnp.asarray(token, jnp.int32), jnp.asarray(prompt_token, jnp.int32),
            jnp.asarray(prompt_feat), jnp.asarray(spk_embedding),
            streaming=stream, finalize=finalize,
            n_timesteps=self._nfe(),
        )
        return self._token2wav_staged_tail(rng, mel, token_offset, state,
                                           finalize, speed)

    def _token2wav_final_bucketed(self, rng, token, spk_embedding,
                                  token_offset, state, sync=True):
        """Host wrapper for the bucketed final-chunk program (_t2w_final_jit):
        pad the cumulative token stream to a 64-token bucket, pass the true
        length and emitted offset as traced scalars, slice the wav to the
        true un-emitted length."""
        n = int(token.shape[1])
        # the CV2 final runs the FULL cumulative stream through the flow, so
        # a single bucket is impossible — coarse 128-token rungs keep the
        # program count at max_len/128 (each warmable; the extra masked
        # compute per final is ~1 ms)
        BKT = 128
        tb = max(BKT, -(-n // BKT) * BKT)
        tok_pad = np.pad(np.asarray(token, np.int32), ((0, 0), (0, tb - n)))

        def _z(x, *shape):
            return np.asarray(x) if x is not None else np.zeros(shape, np.float32)

        hift_mel_w = 0 if state.hift_mel is None else int(state.hift_mel.shape[2])
        wav = self._t2w_final_jit(
            self.flow_params, self.hift_params, rng, jnp.asarray(tok_pad),
            jnp.asarray(n), jnp.asarray(int(token_offset)),
            jnp.asarray(np.asarray(spk_embedding)),
            jnp.asarray(_z(state.hift_mel, 1, 80, 0)),
            jnp.asarray(_z(state.hift_source, 1, 1, 0)),
            jnp.asarray(_z(state.hift_speech, 1, 0)),
            out_tokens=self._final_out_tokens, n_timesteps=self._nfe())
        hift_valid = hift_mel_w + (n - int(token_offset)) * self.fcfg.token_mel_ratio
        wav = wav[:, : hift_valid * self.hop_samples]
        return (wav if not sync else np.asarray(wav)), None

    def _token2wav_staged_tail(self, rng, mel, token_offset, state, finalize,
                               speed):
        mel = np.asarray(mel)[:, :, token_offset * self.fcfg.token_mel_ratio :]

        if state is None:
            state = Stream2State()
        if state.hift_mel is not None:
            mel = np.concatenate([state.hift_mel, mel], axis=2)
            cache_source = state.hift_source
        else:
            cache_source = np.zeros((1, 1, 0), np.float32)

        def run_hift(m, src):
            wav, source = self._hift_jit(
                self.hift_params, rng, jnp.asarray(m),
                jnp.asarray(src) if src.shape[2] else None)
            return np.asarray(wav), np.asarray(source)

        if not finalize:
            wav, source = run_hift(mel, cache_source)
            if state.hift_speech is not None:
                wav = fade_in_out(wav, state.hift_speech, self.speech_window)
            state.hift_mel = mel[:, :, -self.mel_cache_len :]
            state.hift_source = source[:, :, -self.source_cache_len :]
            state.hift_speech = wav[:, -self.source_cache_len :]
            return wav[:, : -self.source_cache_len], state

        if speed != 1.0:
            from ..models.flow import interpolate_linear

            mel = np.asarray(interpolate_linear(jnp.asarray(mel), int(mel.shape[2] / speed)))
        wav, _ = run_hift(mel, cache_source)
        if state.hift_speech is not None:
            wav = fade_in_out(wav, state.hift_speech, self.speech_window)
        return wav, None

    # ------------------------------------------------------------------

    def synthesize(
        self,
        rng: jax.Array,
        text_tokens: Optional[np.ndarray] = None,
        prompt_text: Optional[np.ndarray] = None,
        llm_prompt_speech_token: Optional[np.ndarray] = None,
        flow_prompt_speech_token: Optional[np.ndarray] = None,
        prompt_feat: Optional[np.ndarray] = None,
        flow_embedding: Optional[np.ndarray] = None,
        source_speech_token: Optional[np.ndarray] = None,
        stream: bool = False,
        speed: float = 1.0,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """model.py:372-430 with the staged-pipeline structure."""
        if stream and speed != 1.0:
            # reference: 'speed change only support non-stream inference
            # mode' (model.py:364-365)
            raise ValueError("speed != 1.0 is only supported with stream=False")
        k_llm, k_wav = jax.random.split(rng)
        if flow_embedding is None:
            flow_embedding = np.zeros((1, self.fcfg.spk_embed_dim), np.float32)

        vc_tokens = None
        if source_speech_token is not None and source_speech_token.size:
            vc_tokens = np.asarray(source_speech_token, np.int32).reshape(1, -1)
        fp = flow_prompt_speech_token

        if not stream:
            tokens = vc_tokens if vc_tokens is not None else self.generate_tokens(
                k_llm, text_tokens, prompt_text, llm_prompt_speech_token)
            wav, _ = self.token2wav(k_wav, tokens, fp, prompt_feat, flow_embedding,
                                    token_offset=0, finalize=True, speed=speed)
            yield {"tts_speech": wav}
            return

        # streaming: hops of 25 tokens with pre-lookahead; prompt padded to a
        # hop multiple on the first chunk (model.py:388-404).  Tokens arrive
        # incrementally from the segmented decoder so the first audio leaves
        # after ~one hop, not after the full utterance decodes.
        if vc_tokens is not None:
            producer = iter([(vc_tokens, True)])
        else:
            producer = self.generate_tokens_stream(
                k_llm, text_tokens, prompt_text, llm_prompt_speech_token)
        n_prompt = fp.shape[1] if fp is not None else 0
        pad0 = int(np.ceil(n_prompt / self.token_hop_len) * self.token_hop_len - n_prompt)
        state = Stream2State()
        token_offset = 0
        ki = 0
        tokens = np.zeros((1, 0), np.int32)
        llm_done = False
        while True:
            hop = self.token_hop_len + pad0 if token_offset == 0 else self.token_hop_len
            need = token_offset + hop + self.fcfg.pre_lookahead_len
            while not llm_done and tokens.shape[1] < need:
                tokens, llm_done = next(producer)
            if tokens.shape[1] >= need:
                window = tokens[:, :need]
                wav, state = self.token2wav(
                    jax.random.fold_in(k_wav, ki), window, fp, prompt_feat,
                    flow_embedding, token_offset, state, stream=True, finalize=False)
                token_offset += hop
                ki += 1
                yield {"tts_speech": wav}
                continue
            break
        wav, _ = self.token2wav(
            jax.random.fold_in(k_wav, ki), tokens, fp, prompt_feat, flow_embedding,
            token_offset, state, finalize=True)
        yield {"tts_speech": wav}
