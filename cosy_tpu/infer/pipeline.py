"""TTS inference pipeline: text tokens -> speech tokens -> mel -> waveform.

Reference behavior: cosyvoice/cli/model.py (CosyVoiceModel.tts / token2wav /
llm_job) plus the finetune patches in inference_joint.py:129-151 (mel
normalize/denormalize around flow) and the boundary-trim anti-leakage step
(model.py:182-190).

TPU-first re-design: the reference's producer-thread + polling-consumer
handoff (model.py:234-258) becomes an explicit staged pipeline — a jitted AR
decode produces the full token sequence (or hop-sized chunks in streaming
mode), then flow+HiFT run as batched jitted stages.  Stream chunking keeps the
reference's hop/overlap/fade constants (model.py:51-61).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import InferenceConfig, ModelConfig
from ..ctx import EVAL, Ctx
from ..params import P, Params
from ..utils.aot import aot_jit as _aot_jit_base
from ..layers.basic import dense
from ..models import flow as F
from ..models import llm as L
from ..models import hift as H


def fade_in_out(fade_in: np.ndarray, fade_out: np.ndarray, window: np.ndarray) -> np.ndarray:
    """Crossfade the head of fade_in with the tail of fade_out
    (reference: cosyvoice/utils/common.py:142-152).

    Clamped to the shorter of the two signals: the final streaming chunk can
    be shorter than the overlap window (e.g. after the boundary trim), which
    would crash the reference's unguarded slice."""
    n = min(window.shape[0] // 2, fade_in.shape[-1], fade_out.shape[-1])
    if n == 0:
        return np.array(fade_in)
    half = window.shape[0] // 2
    out = np.array(fade_in)
    out[..., :n] = fade_in[..., :n] * window[:n] + fade_out[..., -n:] * window[half:half + n]
    return out


def fade_in_out_jnp(fade_in: jax.Array, fade_out: jax.Array, window) -> jax.Array:
    """fade_in_out on device (same clamped semantics, static shapes)."""
    n = min(int(window.shape[0]) // 2, fade_in.shape[-1], fade_out.shape[-1])
    if n == 0:
        return fade_in
    half = int(window.shape[0]) // 2
    win = jnp.asarray(window, fade_in.dtype)
    head = fade_in[..., :n] * win[:n] + fade_out[..., -n:] * win[half:half + n]
    return jnp.concatenate([head, fade_in[..., n:]], axis=-1)


def fade_in_out_valid_jnp(fade_in: jax.Array, fade_out: jax.Array, window,
                          valid: jax.Array) -> jax.Array:
    """fade_in_out with the clamp length TRACED: the bucketed final-chunk
    program carries fade_in at a static bucket width, so the host-side clamp
    ``n = min(half, len(fade_in), len(fade_out))`` must use the TRUE length
    (``valid``) instead of the bucket — the unpadded program crossfades only
    min(half, true_len) frames when the final chunk is shorter than the
    overlap window."""
    ov = int(fade_out.shape[-1])
    half = int(window.shape[0]) // 2
    n_static = min(half, int(fade_in.shape[-1]), ov)
    if n_static == 0:
        return fade_in
    n = jnp.minimum(jnp.asarray(n_static), valid)
    win = jnp.asarray(window, fade_in.dtype)
    j = jnp.arange(n_static)
    # fade_out[..., -n:][j] with traced n: index ov - n + j, clamped
    idx = jnp.clip(ov - n + j, 0, ov - 1)
    tail = jnp.take(fade_out, idx, axis=-1)
    mixed = fade_in[..., :n_static] * win[:n_static] + tail * win[half:half + n_static]
    head = jnp.where(j < n, mixed, fade_in[..., :n_static])
    return jnp.concatenate([head, fade_in[..., n_static:]], axis=-1)


# Segmented cohort decodes read only cache columns [0, W) with the W rung
# chosen per segment: W = ceil((L0 + stop) / ATTEND_RUNG) * ATTEND_RUNG,
# clamped to S.  Exact (every key written by the segment lives below W —
# models.llm.llm_decode_batch), and per-token HBM traffic scales with how
# much cache is actually live instead of the worst-case S.  Coarse rungs
# bound the program count at S / ATTEND_RUNG compiles per cohort shape.
ATTEND_RUNG = 256


def attend_rung(L0: int, stop: int, max_len: int) -> int:
    """Static attend_width rung covering cache columns [0, L0 + stop)."""
    S = L0 + max_len
    return min(S, -((L0 + stop) // -ATTEND_RUNG) * ATTEND_RUNG)


def _cap_bucket(max_len: int, bucket: int = 128) -> int:
    """Static decode CAPACITY for a request cap: bucketed up to limit
    program count across requests.  The true per-request cap (the
    reference's max_token_text_ratio bound, llm.py:180) must be enforced
    separately as a traced stop — bucketing the cap itself would let a
    degenerate decode run up to ``bucket-1`` tokens past the reference's
    stop bound."""
    return max(bucket, ((max_len + bucket - 1) // bucket) * bucket)


def _batch_prefixes(built):
    """LEFT-pad per-request prefixes into one batch (shared absolute
    positions/cache slots; see llm_decode_batch).  ``built`` is a list of
    (prefix (1, L, D), min_len, max_len) triples from _build_prefix.
    Returns (prefix (B, L0, D), valid, min_lens, max_lens, max_len) — every
    batched decode entry point (one-shot and streaming-cohort, both
    families) must build its inputs here so their decodes stay bit-identical."""
    L0 = max(int(pr.shape[1]) for pr, _, _ in built)
    L0 = ((L0 + 15) // 16) * 16  # bucket prefix length to limit recompiles
    max_len = _cap_bucket(max(ml for _, _, ml in built))
    prefix = jnp.concatenate([
        jnp.pad(pr, ((0, 0), (L0 - pr.shape[1], 0), (0, 0)))
        for pr, _, _ in built], axis=0)
    valid = jnp.asarray([pr.shape[1] for pr, _, _ in built], jnp.int32)
    min_lens = jnp.asarray([mn for _, mn, _ in built], jnp.int32)
    # each request keeps ITS OWN decode cap (not the batch max)
    max_lens = jnp.asarray([ml for _, _, ml in built], jnp.int32)
    return prefix, valid, min_lens, max_lens, max_len


@dataclasses.dataclass
class StreamState:
    """Per-request streaming carries (reference: model.py:66-72, 192-211)."""
    mel_overlap: np.ndarray  # (1, 80, 0..mel_overlap_len)
    hift_mel: Optional[np.ndarray] = None
    hift_source: Optional[np.ndarray] = None
    hift_speech: Optional[np.ndarray] = None
    flow_cache: Optional[np.ndarray] = None  # (1, 80, C, 2) z/mu carry


class TTSPipeline:
    """Non-streaming and streaming synthesis over flat param dicts."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        llm_params: Params,
        flow_params: Params,
        hift_params: Params,
        infer_cfg: InferenceConfig = InferenceConfig(),
        finetuned_norm: bool = True,
    ):
        self.cfg = model_cfg
        self.icfg = infer_cfg
        self.llm_params = llm_params
        self.flow_params = flow_params
        self.hift_params = hift_params
        self.finetuned_norm = finetuned_norm

        # multi-voice LoRA serving (set_voices): named un-merged adapters
        # routed per request — one base model, ~2M adapter params per voice
        # (the reference's only option is a merged full-model copy per voice)
        self._voice_names: list = []
        self._voice_llm_bank: Optional[Params] = None  # voice-stacked
        self._voice_flow: list = []  # per-voice flat flow adapter dict | None
        self._voice_vids: list = []  # per-voice device int32 ids
        self._llm_lora_scale = 1.0
        self._flow_lora_scale = 1.0

        fr = model_cfg.flow.input_frame_rate
        self.token_min_hop_len = 2 * fr
        # reference constant (model.py:54): unused while stream_scale_factor
        # is pinned to 1 there — kept for config parity only
        self.token_max_hop_len = 4 * fr
        self.token_overlap_len = 20
        self.mel_overlap_len = int(self.token_overlap_len / fr * 22050 / 256)
        self.mel_window = np.hamming(2 * self.mel_overlap_len)
        self.mel_cache_len = 20
        self.source_cache_len = self.mel_cache_len * 256
        self.speech_window = np.hamming(2 * self.source_cache_len)
        # opt-in short first streaming hop (InferenceConfig.first_chunk_tokens,
        # TTFA lever, single-stream paths only).  Clamped below by the
        # smallest window whose emitted audio is non-empty: the non-final
        # emission trims mel_overlap_len frames (next-chunk fade) and
        # source_cache_len samples (HiFT crossfade cache), so a window of
        # W tokens emits ~(W*ratio - mel_overlap - mel_cache) frames
        ratio = model_cfg.flow.token_mel_ratio
        min_first = max(1, int(-(-(self.mel_overlap_len + self.mel_cache_len + 1)
                                 // ratio)) - self.token_overlap_len)
        self.first_hop = (min(max(infer_cfg.first_chunk_tokens, min_first),
                              self.token_min_hop_len)
                          if infer_cfg.first_chunk_tokens else self.token_min_hop_len)
        # bucketed final chunk: single static token bucket (final windows are
        # < hop + overlap by the streaming loops' construction)
        self._final_tok_bucket = -(-(self.token_min_hop_len +
                                     self.token_overlap_len) // 32) * 32

        # AOT-cache salt (utils/aot.py): everything the jit closures bake in
        # that the abstract arg signature cannot see — a config flip must
        # produce a different cache key, never a stale executable
        import os as _os

        def _salt():
            # evaluated at compile/load time: the lora scales change when
            # set_voices registers adapters after construction
            return "|".join(
                [repr(self.cfg), repr(self.icfg),
                 f"fn={self.finetuned_norm}",
                 f"ls={self._llm_lora_scale}",
                 f"fs={self._flow_lora_scale}"]
                + [f"{k}={_os.environ.get(k)}" for k in (
                    "COSY_TPU_ATTN_WINDOW", "COSY_TPU_FLASH",
                    "COSY_TPU_FUSED_BLOCK", "COSY_TPU_HIFT_GEMM",
                    "COSY_TPU_FLASH_MIN_T")])

        def _ajit(fn, static_argnames=(), name=None):
            return _aot_jit_base(fn, static_argnames=static_argnames,
                                 name=name, salt=_salt)

        # jitted stages — eager execution through a remote-TPU runtime is
        # per-op RPC (seconds per stage); jit makes each stage one program
        # per shape bucket.  static config rides via closure.
        # None = flow_inference's dynamic NFE by length (euler); under the
        # distilled sampler honor icfg.meanflow_steps on EVERY path (the
        # in-model default would silently pin 2)
        _nfe_default = (self.icfg.meanflow_steps
                        if self.icfg.sampler == "meanflow" else None)

        def _flow_fn(params, rng, token, prompt_token, prompt_feat, spk, cache,
                     lora=None):
            return F.flow_inference(
                P(params), self.cfg.flow, rng, token, prompt_token, prompt_feat,
                spk, finetuned_norm=self.finetuned_norm or lora is not None,
                mel_norm=(self.cfg.mel_mean, self.cfg.mel_std),
                flow_cache=cache, return_cache=True,
                sampler=self.icfg.sampler, n_timesteps=_nfe_default,
                lora=lora, lora_scale=self._flow_lora_scale)

        self._flow_jit = _ajit(_flow_fn)

        def _hift_fn(params, rng, mel, cache_source):
            return H.hift_inference(P(params), self.cfg.hift, rng, mel, cache_source)

        self._hift_jit = _ajit(_hift_fn)

        # fused STREAMING chunk: flow solve + trim + overlap fades + cache
        # management + HiFT in ONE program.  The staged path costs 2-3 host
        # round-trips per chunk, which dominates per-chunk latency through
        # the remote runtime.  Zero-width state arrays encode the
        # first-chunk case (shape-bucketed compile, not a traced branch).
        def _t2w_stream_fn(flow_p, hift_p, rng, token, prompt_token,
                           prompt_feat, spk, mel_overlap, hift_mel,
                           hift_source, hift_speech, flow_cache, lora=None,
                           *, trim):
            k_flow, k_hift = jax.random.split(rng)  # matches token2wav
            mel, new_cache = F.flow_inference(
                P(flow_p), self.cfg.flow, k_flow, token, prompt_token,
                prompt_feat, spk, finetuned_norm=self.finetuned_norm or lora is not None,
                mel_norm=(self.cfg.mel_mean, self.cfg.mel_std),
                flow_cache=flow_cache if flow_cache.shape[2] else None,
                return_cache=True, sampler=self.icfg.sampler,
                n_timesteps=_nfe_default,
                lora=lora, lora_scale=self._flow_lora_scale)
            if trim > 0:
                mel = mel[:, :, trim:]
            if mel_overlap.shape[2]:
                mel = fade_in_out_jnp(mel, mel_overlap, self.mel_window)
            if hift_mel.shape[2]:
                mel = jnp.concatenate([hift_mel, mel], axis=2)
            new_overlap = mel[:, :, -self.mel_overlap_len:]
            mel = mel[:, :, : -self.mel_overlap_len]
            wav, source = H.hift_inference(
                P(hift_p), self.cfg.hift, k_hift, mel,
                hift_source if hift_source.shape[2] else None)
            if hift_speech.shape[1]:
                wav = fade_in_out_jnp(wav, hift_speech, self.speech_window)
            new_hift_mel = mel[:, :, -self.mel_cache_len:]
            new_source = source[:, :, -self.source_cache_len:]
            new_speech = wav[:, -self.source_cache_len:]
            return (wav[:, : -self.source_cache_len], new_overlap,
                    new_hift_mel, new_source, new_speech, new_cache)

        self._t2w_stream_jit = _ajit(_t2w_stream_fn, static_argnames=("trim",))

        # bucketed FINAL chunk (prompt-free): token window padded to a static
        # bucket + traced true lengths — ONE compiled program serves every
        # final-window length (each distinct length otherwise costs a fresh
        # XLA compile in serving: the stream stalls minutes through a remote
        # runtime the first time a novel length appears).  The valid region
        # is exactly the unpadded program's output (tests/test_bucket_masking
        # pins every masked stage); only the z / sine-noise draw shapes
        # differ, which is distribution-preserving.
        def _t2w_final_fn(flow_p, hift_p, rng, token, tok_valid, mel_valid,
                          spk, mel_overlap, hift_mel, hift_source,
                          hift_speech, flow_cache, lora=None, *, n_timesteps):
            k_flow, k_hift = jax.random.split(rng)  # matches token2wav
            mel = F.flow_inference(
                P(flow_p), self.cfg.flow, k_flow, token,
                jnp.zeros((1, 0), jnp.int32), jnp.zeros((1, 0, 80)), spk,
                n_timesteps=n_timesteps, finetuned_norm=self.finetuned_norm or lora is not None,
                mel_norm=(self.cfg.mel_mean, self.cfg.mel_std),
                flow_cache=flow_cache if flow_cache.shape[2] else None,
                token_valid=tok_valid, mel_valid=mel_valid,
                sampler=self.icfg.sampler,
                lora=lora, lora_scale=self._flow_lora_scale)
            hift_valid = mel_valid
            if mel_overlap.shape[2]:
                mel = fade_in_out_valid_jnp(mel, mel_overlap, self.mel_window,
                                            mel_valid)
            if hift_mel.shape[2]:
                mel = jnp.concatenate([hift_mel, mel], axis=2)
                hift_valid = hift_valid + hift_mel.shape[2]
            wav, _ = H.hift_inference(
                P(hift_p), self.cfg.hift, k_hift, mel,
                hift_source if hift_source.shape[2] else None,
                mel_valid=hift_valid)
            if hift_speech.shape[1]:
                wav = fade_in_out_jnp(wav, hift_speech, self.speech_window)
            return wav  # callers slice [:, :(hift_valid)*256]

        self._t2w_final_jit = _ajit(_t2w_final_fn,
                                      static_argnames=("n_timesteps",))

        # fused non-streaming token2wav: flow solve + boundary trim + HiFT in
        # ONE program — through the remote-TPU runtime each extra program
        # costs a host round-trip (~30 ms), and the host-side work between the
        # stages (trim/fades/caches) is a no-op on this path
        def _t2w_fn(flow_p, hift_p, rng, token, prompt_token, prompt_feat, spk,
                    lora=None, *, trim):
            k_flow, k_hift = jax.random.split(rng)  # matches token2wav's split
            mel = F.flow_inference(
                P(flow_p), self.cfg.flow, k_flow, token, prompt_token,
                prompt_feat, spk, finetuned_norm=self.finetuned_norm or lora is not None,
                mel_norm=(self.cfg.mel_mean, self.cfg.mel_std),
                sampler=self.icfg.sampler, n_timesteps=_nfe_default,
                lora=lora, lora_scale=self._flow_lora_scale)
            if trim > 0:
                mel = mel[:, :, trim:]
            wav, _ = H.hift_inference(P(hift_p), self.cfg.hift, k_hift, mel, None)
            return wav

        self._t2w_jit = _ajit(_t2w_fn, static_argnames=("trim",))

        # LM-prefix pack as ONE jitted program: sos + spk affine + text
        # encoder + task + prompt-speech embeddings.  Eager execution here
        # was the dominant term of streaming TTFA (634-1931 ms of per-op
        # RPC through the remote runtime vs ~25 ms compiled — PERF.md
        # "v1 streaming TTFA decomposition"); every serving route builds a
        # prefix per request, so all of them gain.  One program per
        # (text_len, options) signature — the same granularity the decode
        # programs already compile at (static prefix_len).
        def _prefix_fn(params, tt, spk, pst, lora=None, vid=None):
            p = P(params)
            pctx = EVAL if lora is None else Ctx(
                lora=lora, lora_scale=self._llm_lora_scale, lora_vids=vid[None])
            cfg_l = self.cfg.llm
            text_enc = L.llm_encode_text(
                p, cfg_l, tt, jnp.full((1,), tt.shape[1], jnp.int32), pctx)
            parts = [params["llm_embedding.weight"][cfg_l.sos_eos][None, None]]
            if spk is not None:
                parts.append(dense(p, "spk_embed_affine_layer",
                                   L._l2_normalize(spk, axis=1), pctx)[:, None])
            parts += [text_enc,
                      params["llm_embedding.weight"][cfg_l.task_id][None, None]]
            if pst is not None:
                pse = jnp.take(params["speech_embedding.weight"], pst, axis=0)
                parts.append(pse.reshape(1, -1, cfg_l.llm_input_size))
            return jnp.concatenate(parts, axis=1)

        self._prefix_jit = _ajit(_prefix_fn)

        def _decode_fn(params, rng, prefix, min_len, cap, lora=None, vid=None,
                       *, prefix_len, max_len, top_p, top_k, win_size, tau_r):
            # cap = the request's true stop bound (traced); max_len = the
            # bucketed static capacity
            return L.llm_decode(P(params), self.cfg.llm, rng, prefix, prefix_len,
                                min_len, max_len, top_p=top_p, top_k=top_k,
                                win_size=win_size, tau_r=tau_r,
                                int8_weights=self.icfg.int8_decode,
                                stop_at=cap, lora=lora, vid=vid,
                                lora_scale=self._llm_lora_scale)

        self._decode_jit = _ajit(
            _decode_fn, static_argnames=("prefix_len", "max_len", "top_p",
                                         "top_k", "win_size", "tau_r"))

        # segment-wise decode for streaming: same program semantics, paused
        # at token boundaries (DecodeState round-trips; streams are
        # bit-identical to an uninterrupted run)
        def _decode_seg_fn(params, rng, prefix, min_len, stop_at, state,
                           lora=None, vid=None, *, prefix_len, max_len, top_p,
                           top_k, win_size, tau_r):
            return L.llm_decode(P(params), self.cfg.llm, rng, prefix, prefix_len,
                                min_len, max_len, top_p=top_p, top_k=top_k,
                                win_size=win_size, tau_r=tau_r,
                                int8_weights=self.icfg.int8_decode,
                                stop_at=stop_at, state=state, return_state=True,
                                lora=lora, vid=vid,
                                lora_scale=self._llm_lora_scale)

        self._decode_seg_jit = _ajit(
            _decode_seg_fn, static_argnames=("prefix_len", "max_len", "top_p",
                                             "top_k", "win_size", "tau_r"))

        def _decode_batch_fn(params, rng, prefix, valid, min_lens, max_lens,
                             lora=None, vids=None, *, max_len):
            return L.llm_decode_batch(
                P(params), self.cfg.llm, rng, prefix, valid, min_lens, max_len,
                top_p=self.icfg.sampling_top_p, top_k=self.icfg.sampling_top_k,
                win_size=self.icfg.ras_win_size, tau_r=self.icfg.ras_tau_r,
                int8_weights=self.icfg.int8_decode, max_lens=max_lens,
                lora=lora, vids=vids, lora_scale=self._llm_lora_scale)

        self._decode_batch_jit = _ajit(_decode_batch_fn,
                                         static_argnames=("max_len",))

        # segment-wise batched decode for streaming cohorts (lock-step
        # stop_at + resumable state; bit-identical to the uninterrupted run)
        def _decode_batch_seg_fn(params, rng, prefix, valid, min_lens,
                                 max_lens, stop_at, state, lora=None,
                                 vids=None, *, max_len, attend_width=None):
            return L.llm_decode_batch(
                P(params), self.cfg.llm, rng, prefix, valid, min_lens, max_len,
                top_p=self.icfg.sampling_top_p, top_k=self.icfg.sampling_top_k,
                win_size=self.icfg.ras_win_size, tau_r=self.icfg.ras_tau_r,
                int8_weights=self.icfg.int8_decode, max_lens=max_lens,
                stop_at=stop_at, state=state, return_state=True,
                attend_width=attend_width,
                lora=lora, vids=vids, lora_scale=self._llm_lora_scale)

        self._decode_batch_seg_jit = _ajit(
            _decode_batch_seg_fn,
            static_argnames=("max_len", "attend_width"))

        # continuous-batching slot admission (infer/engine.py): prefill one
        # newcomer and splice it into a paused BatchDecodeState
        def _admit_fn(params, state, prefix, valid, rng_req, slot, cap):
            return L.llm_admit_slot(
                P(params), self.cfg.llm, state, prefix, valid, rng_req, slot,
                cap, top_p=self.icfg.sampling_top_p,
                top_k=self.icfg.sampling_top_k,
                win_size=self.icfg.ras_win_size, tau_r=self.icfg.ras_tau_r)

        self._admit_jit = _ajit(_admit_fn)

    # ------------------------------------------------------------------
    # multi-voice LoRA serving
    # ------------------------------------------------------------------

    def set_voices(self, voices, llm_scale: float = 2.0,
                   flow_scale: float = 2.0) -> None:
        """Register named LoRA voices served UN-merged (vLLM multi-LoRA
        equivalent; the reference can only merge one voice into a full model
        copy each, lora.py:259-323).

        ``voices``: ordered ``{name: {"llm": adapter dict | None,
        "flow": adapter dict | None}}`` — flat ``<param path>.lora_A/B``
        dicts as produced by the trainer (``JointTrainer`` loras) or loaded
        from an adapter checkpoint.  Every voice must cover the same llm
        adapter keys/shapes (same base + LoRAConfig); flow adapters are
        routed per request and may be omitted per voice.  ``llm_scale`` /
        ``flow_scale`` are the adapters' alpha/r (reference defaults
        16/8 = 32/16 = 2.0, config.py:179-224).

        Requests select a voice by name: ``synthesize(..., voice="alice")``.
        Must be called before the first voiced request (the scales close
        over the jitted programs).
        """
        from ..lora import stack_voice_loras

        names = list(voices)
        llm_dicts = [voices[n].get("llm") for n in names]
        if any(d is not None for d in llm_dicts):
            if any(d is None for d in llm_dicts):
                missing = [n for n, d in zip(names, llm_dicts) if d is None]
                raise ValueError(
                    f"voices {missing} lack llm adapters; the voice-stacked "
                    "decode bank needs every voice to cover the same keys")
            bank = stack_voice_loras(llm_dicts)
            # one extra ALL-ZERO row (vid == len(names)): the base voice for
            # MIXED batched/cohort decodes — zero A/B factors give an exactly
            # zero delta, so unvoiced rows in a voiced cohort decode
            # bit-identically to the adapter-free program
            self._voice_llm_bank = {
                k: jnp.concatenate([v, jnp.zeros_like(v[:1])], axis=0)
                for k, v in bank.items()}
        else:
            self._voice_llm_bank = None
        # device-resident per-voice routing tuples, built ONCE here: _voice
        # is called per request (and per streaming chunk by token2wav), so
        # it must not re-upload adapter dicts each time
        self._voice_flow = [
            None if voices[n].get("flow") is None
            else {k: jnp.asarray(v) for k, v in voices[n]["flow"].items()}
            for n in names
        ]
        self._voice_vids = [jnp.asarray(i, jnp.int32) for i in range(len(names))]
        self._voice_names = names
        self._llm_lora_scale = float(llm_scale)
        self._flow_lora_scale = float(flow_scale)

    @property
    def voice_names(self) -> list:
        """Registered multi-voice names (set_voices); [] when unset.  The
        public registry accessor for serving-layer validation."""
        return list(self._voice_names)

    def _voice_batch(self, voices):
        """(bank, vids (B,) int32) for per-row cohort/batch routing, or
        (None, None) when no row needs LLM adapter routing.  Unvoiced rows
        route through the bank's trailing ALL-ZERO base row (vid ==
        len(voice_names)): exact zero delta, bit-identical to the
        adapter-free program.  Voice names are always validated here — a
        flow-only registry (no llm bank) still rejects unknown names, so
        callers need no prior _build_prefix screening."""
        if voices is None or all(not v for v in voices):
            return None, None
        base = len(self._voice_names)
        idx = []
        for v in voices:
            if not v:
                idx.append(base)
            else:
                try:
                    idx.append(self._voice_names.index(v))
                except ValueError:
                    raise KeyError(
                        f"unknown voice {v!r}; registered: "
                        f"{self._voice_names} (set_voices)") from None
        if self._voice_llm_bank is None:  # flow-only voices: no LLM routing
            return None, None
        return self._voice_llm_bank, jnp.asarray(idx, jnp.int32)

    def _voice(self, voice):
        """(llm_bank, vid, flow_lora) for a request's voice (None = base).
        Pure cached lookup — all device arrays were staged by set_voices."""
        if voice is None:
            return None, None, None
        try:
            i = self._voice_names.index(voice)
        except ValueError:
            raise KeyError(
                f"unknown voice {voice!r}; registered: {self._voice_names} "
                "(set_voices)") from None
        return self._voice_llm_bank, self._voice_vids[i], self._voice_flow[i]

    # ------------------------------------------------------------------
    # stage 1: AR speech-token generation
    # ------------------------------------------------------------------

    def _build_prefix(
        self,
        text_tokens: np.ndarray,
        prompt_text: Optional[np.ndarray],
        prompt_speech_token: Optional[np.ndarray],
        spk_embedding: Optional[np.ndarray],
        max_len_cap: int,
        voice: Optional[str] = None,
    ):
        """Pack [sos, spk?, text_enc, task, prompt_speech?]; returns
        (prefix, min_len, max_len).  ``voice`` routes the text encoding
        through that voice's llm adapters (set_voices) so the prefix matches
        a merged-weights build exactly."""
        bank = vid = None
        if voice is not None:
            bank, vid, _ = self._voice(voice)

        tt = np.asarray(text_tokens)
        if prompt_text is not None and prompt_text.size:
            tt = np.concatenate([np.asarray(prompt_text), tt], axis=1)
        text_len = tt.shape[1]
        prompt_text_len = prompt_text.shape[1] if prompt_text is not None else 0

        # spk_embedding=None omits the speaker row entirely, matching the
        # reference's empty-embedding path (llm.py:188-193, instruct mode);
        # the whole pack runs as one jitted program (see _prefix_fn)
        spk = None if spk_embedding is None else \
            jnp.asarray(spk_embedding, jnp.float32)
        pst = None
        if prompt_speech_token is not None and np.asarray(prompt_speech_token).size:
            pst = jnp.asarray(prompt_speech_token, jnp.int32)
        prefix = self._prefix_jit(self.llm_params, jnp.asarray(tt, jnp.int32),
                                  spk, pst, bank, vid)

        target_text = text_len - prompt_text_len
        min_len = int(target_text * self.icfg.min_token_text_ratio)
        # the TRUE per-request cap (llm.py:180); consumers bucket the static
        # decode capacity with _cap_bucket and enforce this cap as a traced
        # stop so short texts keep the reference's stop bound exactly
        max_len = min(int(target_text * self.icfg.max_token_text_ratio), max_len_cap)
        return prefix, min_len, max_len

    def generate_tokens(
        self,
        rng: jax.Array,
        text_tokens: np.ndarray,  # (1, Tt)
        prompt_text: Optional[np.ndarray] = None,  # (1, Tp)
        prompt_speech_token: Optional[np.ndarray] = None,
        spk_embedding: Optional[np.ndarray] = None,  # (1, 192); zeros = prompt-free
        max_len_cap: int = 2048,
        voice: Optional[str] = None,
    ) -> np.ndarray:
        """Build the LM prefix and run the jitted while-loop decode
        (reference: llm.py:164-228)."""
        prefix, min_len, max_len = self._build_prefix(
            text_tokens, prompt_text, prompt_speech_token, spk_embedding,
            max_len_cap, voice=voice)
        bank, vid, _ = self._voice(voice)
        res = self._decode_jit(
            self.llm_params, rng, prefix, jnp.asarray(min_len),
            jnp.asarray(max_len), bank, vid,
            prefix_len=prefix.shape[1], max_len=_cap_bucket(max_len),
            top_p=self.icfg.sampling_top_p, top_k=self.icfg.sampling_top_k,
            win_size=self.icfg.ras_win_size, tau_r=self.icfg.ras_tau_r,
        )
        n = int(res.length)
        return np.asarray(res.tokens)[None, :n]

    def generate_tokens_stream(
        self,
        rng: jax.Array,
        text_tokens: np.ndarray,
        prompt_text: Optional[np.ndarray] = None,
        prompt_speech_token: Optional[np.ndarray] = None,
        spk_embedding: Optional[np.ndarray] = None,
        max_len_cap: int = 2048,
        voice: Optional[str] = None,
    ):
        """Incremental token producer: yields (tokens_so_far (1, n), done)
        after each decode segment — the TPU-native replacement for the
        reference's llm_job producer thread (model.py:144-165).  Token
        streams are identical to generate_tokens under the same rng."""
        prefix, min_len, max_len = self._build_prefix(
            text_tokens, prompt_text, prompt_speech_token, spk_embedding,
            max_len_cap, voice=voice)
        bank, vid, _ = self._voice(voice)
        kw = dict(prefix_len=prefix.shape[1], max_len=_cap_bucket(max_len),
                  top_p=self.icfg.sampling_top_p, top_k=self.icfg.sampling_top_k,
                  win_size=self.icfg.ras_win_size, tau_r=self.icfg.ras_tau_r)
        seg = self.first_hop + self.token_overlap_len
        target = min(seg, max_len)  # targets bound by the TRUE request cap
        pending = self._decode_seg_jit(
            self.llm_params, rng, prefix, jnp.asarray(min_len),
            jnp.asarray(target), None, bank, vid, **kw)
        while True:
            res, state = pending
            # prefetch: submit segment k+1 from the (still in-flight) device
            # state BEFORE syncing segment k — the next segment executes
            # while the consumer synthesizes chunk k (pure dispatch
            # pipelining; the token stream is bit-identical, the resumed
            # while_loop sees the same state either way, and a post-EOS
            # submission exits its loop immediately)
            next_target = min(target + self.token_min_hop_len, max_len)
            if next_target > target:
                pending = self._decode_seg_jit(
                    self.llm_params, rng, prefix, jnp.asarray(min_len),
                    jnp.asarray(next_target), state, bank, vid, **kw)
            n = int(res.length)
            done = bool(state.done) or n >= max_len
            yield np.asarray(res.tokens)[None, :n], done
            if done:
                return
            target = next_target

    def synthesize_batch(
        self,
        rng: jax.Array,
        text_tokens_list,  # list of (1, Tt) arrays
        spk_embeddings=None,  # list of (1, 192) or None entries
        speed=1.0,  # float or per-request list
        max_len_cap: int = 2048,
        voices=None,  # per-request voice names ("" / None = base)
    ):
        """Micro-batched non-streaming synthesis for serving: one
        llm_decode_batch call amortizes the per-token weight read across
        requests (PERF.md: 2.5x aggregate tok/s at B=8), then flow+vocoder
        run per request.  Returns a list of (1, n) wavs.

        ``voices`` routes each row through its registered LoRA adapters
        (set_voices) inside the SHARED decode — mixed voiced/base batches
        are fine (base rows take the bank's zero row)."""
        B = len(text_tokens_list)
        if spk_embeddings is None:
            spk_embeddings = [None] * B
        if voices is None:
            voices = [None] * B
        speeds = list(speed) if isinstance(speed, (list, tuple)) else [speed] * B
        built = [self._build_prefix(t, None, None, s, max_len_cap,
                                    voice=v or None)
                 for t, s, v in zip(text_tokens_list, spk_embeddings, voices)]
        prefix, valid, min_lens, max_lens, max_len = _batch_prefixes(built)
        bank, vids = self._voice_batch(voices)

        k_llm, k_wav = jax.random.split(rng)
        res = self._decode_batch_jit(
            self.llm_params, k_llm, prefix, valid, min_lens, max_lens,
            bank, vids, max_len=max_len)
        # dispatch every request's fused token2wav before syncing any of them:
        # the per-program host round-trips overlap with device execution
        futs = []
        for b in range(B):
            n = int(res.lengths[b])
            tokens = np.asarray(res.tokens[b])[None, :n]
            spk = (np.zeros((1, self.cfg.llm.spk_embed_dim), np.float32)
                   if spk_embeddings[b] is None else np.asarray(spk_embeddings[b]))
            rng_b = jax.random.fold_in(k_wav, b)
            _, _, flow_lora = self._voice(voices[b] or None)
            fut = self._token2wav_fused(
                rng_b, tokens, np.zeros((1, 0), np.int32),
                np.zeros((1, 0, 80), np.float32), spk, None, True, speeds[b],
                flow_lora=flow_lora)
            futs.append((fut, rng_b, tokens, spk, speeds[b], voices[b]))
        wavs = []
        for fut, rng_b, tokens, spk, sp, v in futs:
            if fut is not None:
                wavs.append(np.asarray(fut))
            else:
                wav, _ = self.token2wav(rng_b, tokens, None, None, spk,
                                        finalize=True, speed=sp,
                                        voice=v or None)
                wavs.append(wav)
        return wavs

    def synthesize_stream_batch(
        self,
        rng: jax.Array,
        text_tokens_list,  # list of (1, Tt) arrays
        spk_embeddings=None,  # list of (1, 192) or None entries
        max_len_cap: int = 2048,
        voices=None,  # per-request voice names ("" / None = base)
    ):
        """Batched streaming synthesis for serving: one lock-step segmented
        decode (llm_decode_batch stop_at/state) amortizes the per-token
        weight read across all concurrent streams — the dominant cost of
        bs=1 decode (PERF.md) — while each stream still emits hop-sized
        audio chunks with the reference's overlap/fade semantics.

        Yields (request_index, wav (1, n), done).  Token streams are
        bit-identical to per-request llm_decode runs (same fold_in(rng, b)
        streams as synthesize_batch).

        ``voices``: per-row LoRA adapter routing inside the shared decode
        (set_voices; mixed voiced/base cohorts supported — base rows take
        the bank's zero row).
        """
        B = len(text_tokens_list)
        if spk_embeddings is None:
            spk_embeddings = [None] * B
        if voices is None:
            voices = [None] * B
        built = [self._build_prefix(t, None, None, s, max_len_cap,
                                    voice=v or None)
                 for t, s, v in zip(text_tokens_list, spk_embeddings, voices)]
        prefix, valid, min_lens, max_lens, max_len = _batch_prefixes(built)
        bank, vids = self._voice_batch(voices)

        k_llm, k_wav = jax.random.split(rng)
        spks = [np.zeros((1, self.cfg.llm.spk_embed_dim), np.float32)
                if s is None else np.asarray(s) for s in spk_embeddings]

        hop = self.token_min_hop_len
        seg = hop + self.token_overlap_len
        states = [StreamState(mel_overlap=np.zeros((1, 80, 0), np.float32))
                  for _ in range(B)]
        pos = [0] * B
        ki = [0] * B
        finished = [False] * B
        dstate = None
        target = min(seg, max_len)
        while not all(finished):
            res, dstate = self._decode_batch_seg_jit(
                self.llm_params, k_llm, prefix, valid, min_lens, max_lens,
                jnp.asarray(target), dstate, bank, vids, max_len=max_len,
                attend_width=attend_rung(prefix.shape[1], target, max_len))
            lengths = np.asarray(res.lengths)
            done_dev = np.asarray(dstate.done)
            all_tokens = np.asarray(res.tokens)
            cohort_done = bool(done_dev.all()) or target >= max_len
            for b in range(B):
                if finished[b]:
                    continue
                n = int(lengths[b])
                stream_done = bool(done_dev[b]) or cohort_done
                # emit hop-sized windows while enough lookahead exists
                while n - pos[b] >= hop + self.token_overlap_len:
                    window = all_tokens[b][None, pos[b]: pos[b] + hop + self.token_overlap_len]
                    wav, states[b] = self.token2wav(
                        jax.random.fold_in(jax.random.fold_in(k_wav, b), ki[b]),
                        window, None, None, spks[b],
                        stream_state=states[b], finalize=False,
                        voice=voices[b] or None)
                    yield b, wav, False
                    pos[b] += hop
                    ki[b] += 1
                if stream_done:
                    window = all_tokens[b][None, pos[b]: n]
                    wav, _ = self.token2wav(
                        jax.random.fold_in(jax.random.fold_in(k_wav, b), ki[b]),
                        window, None, None, spks[b],
                        stream_state=states[b], finalize=True,
                        voice=voices[b] or None)
                    finished[b] = True
                    yield b, wav, True
            target = min(target + hop, max_len)

    # ------------------------------------------------------------------
    # stage 2+3: tokens -> mel -> wav
    # ------------------------------------------------------------------

    def _select_nfe(self, mel_len: int) -> int:
        """Dynamic NFE by true mel length (reference: flow_model.py:525-536);
        a fixed few-step count under the distilled MeanFlow sampler."""
        if self.icfg.sampler == "meanflow":
            return self.icfg.meanflow_steps
        return (self.icfg.nfe_long if mel_len > self.icfg.nfe_long_threshold
                else self.icfg.nfe_mid if mel_len > self.icfg.nfe_mid_threshold
                else self.icfg.nfe_short)

    def token2wav(
        self,
        rng: jax.Array,
        token: np.ndarray,  # (1, T)
        prompt_token: Optional[np.ndarray],
        prompt_feat: Optional[np.ndarray],  # (1, Tm, 80) raw mel
        spk_embedding: np.ndarray,  # (1, 192)
        stream_state: Optional[StreamState] = None,
        finalize: bool = True,
        speed: float = 1.0,
        sync: bool = True,
        voice: Optional[str] = None,
    ) -> Tuple[np.ndarray, Optional[StreamState]]:
        """Flow + boundary trim + (stream fades/caches) + HiFT
        (reference: model.py:171-219).

        ``voice`` applies that registered voice's flow adapters
        (set_voices) inside the flow solve, un-merged.

        ``sync=False`` (honored on the fused non-streaming path) returns the
        un-synced device array instead of host numpy, so callers can enqueue
        several independent token2wav programs before paying the (remote
        runtime) round-trip once — through the tunnel the per-call sync
        otherwise doubles steady-state cost (measured 81 -> 35 ms/call).
        """
        if speed != 1.0 and stream_state is not None and stream_state.hift_mel is not None:
            # the speed interpolation below runs on the full mel AFTER the
            # hift-cache concat, which would stretch the crossfade-cache
            # region — the reference forbids the combination outright
            # (model.py:213-214)
            raise ValueError("speed change only supports non-stream inference mode")
        k_flow, k_hift = jax.random.split(rng)
        prompt_token = prompt_token if prompt_token is not None else np.zeros((1, 0), np.int32)
        prompt_feat = prompt_feat if prompt_feat is not None else np.zeros((1, 0, 80), np.float32)
        if (self.icfg.sampler == "meanflow" and prompt_token.shape[1]
                and not getattr(self, "_warned_mf_prompt", False)):
            # flow_distill_loss trains the student prompt-free (conds == 0,
            # the fine-tune serving configuration); prompted conds are
            # out-of-distribution for the distilled u-field
            print("WARNING: meanflow sampler with a prompt — the distilled "
                  "student was trained prompt-free; expect degraded output "
                  "(use the euler sampler for prompted synthesis)")
            self._warned_mf_prompt = True
        _, _, flow_lora = self._voice(voice)

        fut = self._token2wav_fused(rng, token, prompt_token, prompt_feat,
                                    spk_embedding, stream_state, finalize,
                                    speed, flow_lora=flow_lora)
        if fut is not None:
            return (fut if not sync else np.asarray(fut)), None
        sres = self._token2wav_stream_fused(rng, token, prompt_token,
                                            prompt_feat, spk_embedding,
                                            stream_state, finalize, speed,
                                            flow_lora=flow_lora)
        if sres is not None:
            return sres

        # bucketed FINAL chunk: one program per (bucket, state-shape) serves
        # every final-window length — the per-length staged programs below
        # would cost a fresh XLA compile for each novel length in serving
        if (self.icfg.bucket_final and stream_state is not None and finalize
                and speed == 1.0 and prompt_token.shape[1] == 0
                and prompt_feat.shape[1] == 0
                and 0 < token.shape[1] <= self._final_tok_bucket):
            return self._token2wav_final_bucketed(rng, token, spk_embedding,
                                                  stream_state, sync,
                                                  flow_lora=flow_lora)

        carry = stream_state.flow_cache if stream_state is not None else None
        mel, new_flow_cache = self._flow_jit(
            self.flow_params, k_flow,
            jnp.asarray(token, jnp.int32), jnp.asarray(prompt_token, jnp.int32),
            jnp.asarray(prompt_feat), jnp.asarray(spk_embedding),
            jnp.asarray(carry) if carry is not None else None,
            flow_lora,
        )
        mel = np.asarray(mel)  # (1, 80, Tmel)

        # anti-leakage boundary trim (model.py:182-190)
        boundary_trim = int(prompt_feat.shape[1] * self.icfg.boundary_trim_ratio)
        if boundary_trim > 0 and mel.shape[2] > boundary_trim:
            mel = mel[:, :, boundary_trim:]

        if stream_state is None:
            stream_state = StreamState(mel_overlap=np.zeros((1, 80, 0), np.float32))
        stream_state.flow_cache = np.asarray(new_flow_cache)

        if stream_state.mel_overlap.shape[2] != 0:
            mel = fade_in_out(mel, stream_state.mel_overlap, self.mel_window)

        if stream_state.hift_mel is not None:
            mel = np.concatenate([stream_state.hift_mel, mel], axis=2)
            cache_source = stream_state.hift_source
        else:
            cache_source = np.zeros((1, 1, 0), np.float32)

        if not finalize:
            stream_state.mel_overlap = mel[:, :, -self.mel_overlap_len:]
            mel = mel[:, :, : -self.mel_overlap_len]
            wav, source = self._hift(k_hift, mel, cache_source)
            if stream_state.hift_speech is not None:
                wav = fade_in_out(wav, stream_state.hift_speech, self.speech_window)
            stream_state.hift_mel = mel[:, :, -self.mel_cache_len:]
            stream_state.hift_source = source[:, :, -self.source_cache_len:]
            stream_state.hift_speech = wav[:, -self.source_cache_len:]
            wav = wav[:, : -self.source_cache_len]
            return wav, stream_state

        if speed != 1.0:
            mel = np.asarray(F.interpolate_linear(jnp.asarray(mel), int(mel.shape[2] / speed)))
        wav, _ = self._hift(k_hift, mel, cache_source)
        if stream_state.hift_speech is not None:
            wav = fade_in_out(wav, stream_state.hift_speech, self.speech_window)
        return wav, None

    def _token2wav_final_bucketed(self, rng, token, spk_embedding,
                                  stream_state, sync=True, flow_lora=None):
        """Host wrapper for the bucketed final-chunk program (_t2w_final_jit):
        pad the token window to the bucket, pass the traced true lengths,
        slice the wav back to the true length.  n_timesteps is chosen from
        the TRUE length, matching flow_inference's own selection."""
        n = int(token.shape[1])
        # ONE fixed bucket (the final window is < hop + overlap tokens by the
        # streaming loops' construction): a granularity ladder would still
        # compile a novel program the first time a new rung appears
        # mid-serving — measured as a ~90 s stream stall through the tunnel
        tb = self._final_tok_bucket
        mel2 = int(n / self.cfg.flow.input_frame_rate * 22050 / 256)
        nfe = self._select_nfe(mel2)
        tok_pad = np.pad(np.asarray(token, np.int32), ((0, 0), (0, tb - n)))

        def _z(x, *shape):
            return np.asarray(x) if x is not None else np.zeros(shape, np.float32)

        st = stream_state
        hift_mel_w = 0 if st.hift_mel is None else int(st.hift_mel.shape[2])
        wav = self._t2w_final_jit(
            self.flow_params, self.hift_params, rng, jnp.asarray(tok_pad),
            jnp.asarray(n), jnp.asarray(mel2),
            jnp.asarray(np.asarray(spk_embedding)),
            jnp.asarray(np.asarray(st.mel_overlap)),
            jnp.asarray(_z(st.hift_mel, 1, 80, 0)),
            jnp.asarray(_z(st.hift_source, 1, 1, 0)),
            jnp.asarray(_z(st.hift_speech, 1, 0)),
            jnp.asarray(_z(st.flow_cache, 1, 80, 0, 2)),
            flow_lora, n_timesteps=nfe)
        wav = wav[:, : (hift_mel_w + mel2) * 256]
        return (wav if not sync else np.asarray(wav)), None

    def _token2wav_fused(self, rng, token, prompt_token, prompt_feat,
                         spk_embedding, stream_state, finalize, speed,
                         flow_lora=None):
        """Dispatch the single-program token2wav when the host-side stages
        between flow and HiFT are no-ops (non-streaming finalize at natural
        speed).  Returns the un-synced device array (async — callers may
        pipeline several requests before touching the result), or None when
        the staged path must run."""
        if not (stream_state is None and finalize and speed == 1.0):
            return None
        mel_len2 = int(token.shape[1] / self.cfg.flow.input_frame_rate * 22050 / 256)
        trim = int(prompt_feat.shape[1] * self.icfg.boundary_trim_ratio)
        trim = trim if (trim > 0 and mel_len2 > trim) else 0
        return self._t2w_jit(
            self.flow_params, self.hift_params, rng,
            jnp.asarray(token, jnp.int32), jnp.asarray(prompt_token, jnp.int32),
            jnp.asarray(prompt_feat), jnp.asarray(spk_embedding), flow_lora,
            trim=trim)

    def _token2wav_stream_fused(self, rng, token, prompt_token, prompt_feat,
                                spk_embedding, state, finalize, speed,
                                flow_lora=None):
        """One-program streaming chunk (non-final): flow + trim + fades +
        caches + HiFT (see _t2w_stream_jit).  Returns (wav, updated state) or
        None when the staged path must run (finalize or speed != 1.0).
        Zero-width arrays stand in for first-chunk None carries."""
        if not (state is not None and not finalize and speed == 1.0):
            return None
        mel_len2 = int(token.shape[1] / self.cfg.flow.input_frame_rate * 22050 / 256)
        trim = int(prompt_feat.shape[1] * self.icfg.boundary_trim_ratio)
        trim = trim if (trim > 0 and mel_len2 > trim) else 0

        def _or_empty(x, *shape):
            return np.asarray(x) if x is not None else np.zeros(shape, np.float32)

        out = self._t2w_stream_jit(
            self.flow_params, self.hift_params, rng,
            jnp.asarray(token, jnp.int32), jnp.asarray(prompt_token, jnp.int32),
            jnp.asarray(prompt_feat), jnp.asarray(spk_embedding),
            jnp.asarray(state.mel_overlap),
            jnp.asarray(_or_empty(state.hift_mel, 1, 80, 0)),
            jnp.asarray(_or_empty(state.hift_source, 1, 1, 0)),
            jnp.asarray(_or_empty(state.hift_speech, 1, 0)),
            jnp.asarray(_or_empty(state.flow_cache, 1, 80, 0, 2)),
            flow_lora, trim=trim)
        wav, mo, hm, hs, hsp, fc = out
        state.mel_overlap = np.asarray(mo)
        state.hift_mel = np.asarray(hm)
        state.hift_source = np.asarray(hs)
        state.hift_speech = np.asarray(hsp)
        state.flow_cache = np.asarray(fc)
        return np.asarray(wav), state

    def _hift(self, rng, mel: np.ndarray, cache_source: np.ndarray):
        wav, source = self._hift_jit(
            self.hift_params, rng, jnp.asarray(mel),
            jnp.asarray(cache_source) if cache_source.shape[2] else None)
        return np.asarray(wav), np.asarray(source)

    # ------------------------------------------------------------------
    # full pipeline
    # ------------------------------------------------------------------

    def synthesize(
        self,
        rng: jax.Array,
        text_tokens: Optional[np.ndarray] = None,
        prompt_text: Optional[np.ndarray] = None,
        prompt_speech_token: Optional[np.ndarray] = None,
        prompt_feat: Optional[np.ndarray] = None,
        spk_embedding: Optional[np.ndarray] = None,
        llm_prompt_speech_token: Optional[np.ndarray] = None,
        flow_prompt_speech_token: Optional[np.ndarray] = None,
        llm_embedding: Optional[np.ndarray] = None,
        flow_embedding: Optional[np.ndarray] = None,
        source_speech_token: Optional[np.ndarray] = None,
        stream: bool = False,
        speed: float = 1.0,
        voice: Optional[str] = None,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields {'tts_speech': (1, n) float32} chunks (one chunk when
        stream=False), mirroring CosyVoiceModel.tts (model.py:221-288).

        ``source_speech_token`` enables the VC path: speech tokens bypass the
        LLM entirely (model.py:167-169).  The llm_/flow_-prefixed arguments
        mirror the reference's split conditioning; the unprefixed ones are a
        convenience that applies to both stages.

        ``voice`` selects a registered multi-voice LoRA adapter set
        (set_voices): the request decodes and solves through that voice's
        un-merged adapters.
        """
        if stream and speed != 1.0:
            # reference: 'speed change only support non-stream inference
            # mode' (model.py:213-214) — silently playing at 1.0x (or
            # stretching the crossfade-cache region) would be worse
            raise ValueError("speed != 1.0 is only supported with stream=False")
        k_llm, k_wav = jax.random.split(rng)
        llm_prompt = llm_prompt_speech_token if llm_prompt_speech_token is not None else prompt_speech_token
        flow_prompt = flow_prompt_speech_token if flow_prompt_speech_token is not None else prompt_speech_token
        llm_emb = llm_embedding if llm_embedding is not None else spk_embedding
        flow_emb = flow_embedding if flow_embedding is not None else spk_embedding
        if flow_emb is None:
            flow_emb = np.zeros((1, self.cfg.llm.spk_embed_dim), np.float32)

        vc_tokens = None
        if source_speech_token is not None and source_speech_token.size:
            vc_tokens = np.asarray(source_speech_token, np.int32).reshape(1, -1)

        prompt_speech_token = flow_prompt
        spk_embedding = flow_emb
        if not stream:
            tokens = vc_tokens if vc_tokens is not None else self.generate_tokens(
                k_llm, text_tokens, prompt_text, llm_prompt, llm_emb,
                voice=voice)
            wav, _ = self.token2wav(
                k_wav, tokens, prompt_speech_token, prompt_feat, spk_embedding,
                finalize=True, speed=speed, voice=voice)
            yield {"tts_speech": wav}
            return

        # streaming: interleave incremental decode segments with hop-sized
        # synthesis windows — first audio leaves after hop+overlap tokens,
        # not after the full utterance decodes (reference: llm_job producer
        # thread + consumer loop, model.py:221-288)
        if vc_tokens is not None:
            producer = iter([(vc_tokens, True)])
        else:
            producer = self.generate_tokens_stream(
                k_llm, text_tokens, prompt_text, llm_prompt, llm_emb,
                voice=voice)

        state = StreamState(mel_overlap=np.zeros((1, 80, 0), np.float32))
        hop = self.token_min_hop_len
        # first chunk may use the shorter opt-in hop (first_chunk_tokens):
        # first audio leaves after first_hop + overlap tokens, later chunks
        # keep the reference hop geometry
        cur_hop = self.first_hop
        pos = 0
        ki = 0
        tokens = np.zeros((1, 0), np.int32)
        llm_done = False
        while True:
            while not llm_done and tokens.shape[1] - pos < cur_hop + self.token_overlap_len:
                tokens, llm_done = next(producer)
            if tokens.shape[1] - pos >= cur_hop + self.token_overlap_len:
                window = tokens[:, pos : pos + cur_hop + self.token_overlap_len]
                wav, state = self.token2wav(
                    jax.random.fold_in(k_wav, ki), window, prompt_speech_token,
                    prompt_feat, spk_embedding, stream_state=state,
                    finalize=False, voice=voice)
                yield {"tts_speech": wav}
                pos += cur_hop
                cur_hop = hop
                # hop stays at token_min_hop_len after the first chunk: the
                # reference's stream_scale_factor is pinned to 1
                # (model.py:54-56, with an assert), so its hop-growth hook
                # (min with token_max_hop_len) never fires — not implemented
                ki += 1
                continue
            if llm_done:
                window = tokens[:, pos:]
                wav, _ = self.token2wav(
                    jax.random.fold_in(k_wav, ki), window, prompt_speech_token,
                    prompt_feat, spk_embedding, stream_state=state,
                    finalize=True, voice=voice)
                yield {"tts_speech": wav}
                return
