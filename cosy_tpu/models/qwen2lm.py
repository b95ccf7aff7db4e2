"""Qwen2LM — CosyVoice2's speech-token LLM over the Qwen2 backbone.

Reference behavior: cosyvoice/llm/llm.py:262-611 (Qwen2LM).  TPU-first:
- the ragged uni/bistream sequence mixing (prepare_lm_input_target,
  llm.py:304-344) is built densely with integer index maps — both layouts are
  materialized and selected per sample with the reference's coin flip
  (p=0.5 and speech/text ratio > mix_ratio[1]/mix_ratio[0]);
- AR decode is a fixed-capacity lax.while_loop with GQA KV caches; tokens
  above speech_token_size are skipped without feeding (llm.py:504-507).

Weight naming: llm.model.model.* (HF Qwen2 under the Qwen2Encoder wrapper),
llm_embedding, llm_decoder, speech_embedding — loads CosyVoice2 llm.pt
verbatim.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ctx import Ctx, EVAL
from ..params import P, Params, KeyGen, init_linear, init_embedding
from ..ops import masks as M
from ..ops.sampling import ras_sample
from ..layers.basic import dense, embedding
from ..layers.qwen2 import Qwen2Config, init_qwen2_params, qwen2_forward, qwen2_layer, rms_norm
from .llm import IGNORE_ID, label_smoothing_loss, th_accuracy
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Qwen2LMConfig:
    llm_input_size: int = 896
    llm_output_size: int = 896
    speech_token_size: int = 6561  # CosyVoice2 FSQ speech tokens
    sos_eos: int = 0
    task_id: int = 1
    fill_token: int = 2
    mix_ratio: Tuple[int, int] = (5, 15)
    length_normalized_loss: bool = True
    lsm_weight: float = 0.0
    qwen: Qwen2Config = field(default_factory=Qwen2Config)


# ---------------------------------------------------------------------------
# Dense uni/bistream packing
# ---------------------------------------------------------------------------


def _pack_unistream(cfg, pos, tl, sl, text_emb_g, speech_emb_g, speech_tok_g, sos, task):
    """input [sos, text, task, speech]; target [IGN*(1+tl), speech, EOS]
    (llm.py:335-338)."""
    is_sos = pos == 0
    is_text = (pos >= 1) & (pos < 1 + tl)
    is_task = pos == 1 + tl
    is_speech = (pos > 1 + tl) & (pos < 2 + tl + sl)
    t_idx = jnp.clip(pos - 1, 0, text_emb_g.shape[1] - 1)
    s_idx = jnp.clip(pos - 2 - tl, 0, speech_emb_g.shape[1] - 1)
    g_text = jnp.take_along_axis(text_emb_g, jnp.broadcast_to(t_idx, tl.shape[:1] + pos.shape[1:])[:, :, None], axis=1)
    g_speech = jnp.take_along_axis(speech_emb_g, s_idx[:, :, None], axis=1)
    lm_input = jnp.where(
        is_sos[:, :, None], sos,
        jnp.where(is_text[:, :, None], g_text,
                  jnp.where(is_task[:, :, None], task,
                            jnp.where(is_speech[:, :, None], g_speech, 0.0))))
    # target
    tgt_sidx = jnp.clip(pos - 1 - tl, 0, speech_tok_g.shape[1] - 1)
    g_tok = jnp.take_along_axis(speech_tok_g, jnp.broadcast_to(tgt_sidx, tl.shape[:1] + pos.shape[1:]), axis=1)
    is_tgt_speech = (pos >= 1 + tl) & (pos < 1 + tl + sl)
    is_eos = pos == 1 + tl + sl
    lm_target = jnp.where(is_tgt_speech, g_tok,
                          jnp.where(is_eos, cfg.speech_token_size, IGNORE_ID))
    lm_len = (2 + tl + sl)[:, 0]
    return lm_input, lm_target, lm_len


def _pack_bistream(cfg, pos, tl, sl, text_emb_g, speech_emb_g, speech_tok_g, sos, task):
    """Interleaved [5 text | 15 speech] blocks with FILL targets, then the
    partial tail [text_rest, task, speech_rest] (llm.py:312-333)."""
    m0, m1 = cfg.mix_ratio
    blk = m0 + m1
    n_full = tl // m0  # number of complete text blocks
    q = pos - 1
    block = q // blk
    off = q % blk
    in_blocks = (pos >= 1) & (block < n_full)

    base = 1 + blk * n_full
    r = pos - base
    t_rest = tl - m0 * n_full
    s_rest = sl - m1 * n_full

    # ---- input selection ----
    blk_is_text = in_blocks & (off < m0)
    blk_t_idx = block * m0 + off
    blk_s_idx = block * m1 + (off - m0)
    tail_is_text = (r >= 0) & (r < t_rest)
    tail_is_task = r == t_rest
    tail_is_speech = (r > t_rest) & (r < t_rest + 1 + s_rest)
    tail_s_idx = m1 * n_full + r - t_rest - 1
    tail_t_idx = m0 * n_full + r

    t_idx = jnp.clip(jnp.where(blk_is_text, blk_t_idx, tail_t_idx), 0, text_emb_g.shape[1] - 1)
    s_idx = jnp.clip(jnp.where(in_blocks, blk_s_idx, tail_s_idx), 0, speech_emb_g.shape[1] - 1)
    g_text = jnp.take_along_axis(text_emb_g, t_idx[:, :, None], axis=1)
    g_speech = jnp.take_along_axis(speech_emb_g, s_idx[:, :, None], axis=1)

    lm_input = jnp.where(
        (pos == 0)[:, :, None], sos,
        jnp.where((blk_is_text | tail_is_text)[:, :, None], g_text,
                  jnp.where(tail_is_task[:, :, None], task,
                            jnp.where(((in_blocks & (off >= m0)) | tail_is_speech)[:, :, None],
                                      g_speech, 0.0))))

    # ---- target selection ----
    # full block: off 0..m0-2 -> IGNORE; off m0-1..m0+m1-2 -> speech; off last -> FILL
    blk_tgt_speech = in_blocks & (off >= m0 - 1) & (off < m0 - 1 + m1)
    blk_tgt_fill = in_blocks & (off == blk - 1)
    blk_tgt_sidx = block * m1 + (off - (m0 - 1))
    # tail: r 0..t_rest-1 IGNORE; t_rest..t_rest+s_rest-1 speech; then EOS
    tail_tgt_speech = (r >= t_rest) & (r < t_rest + s_rest)
    tail_tgt_eos = r == t_rest + s_rest
    tail_tgt_sidx = m1 * n_full + r - t_rest

    tgt_sidx = jnp.clip(jnp.where(in_blocks, blk_tgt_sidx, tail_tgt_sidx), 0,
                        speech_tok_g.shape[1] - 1)
    g_tok = jnp.take_along_axis(speech_tok_g, tgt_sidx, axis=1)
    lm_target = jnp.where(
        blk_tgt_fill, cfg.speech_token_size + 2,
        jnp.where(blk_tgt_speech | tail_tgt_speech, g_tok,
                  jnp.where(tail_tgt_eos & (pos > 0), cfg.speech_token_size, IGNORE_ID)))
    lm_len = (2 + tl + sl)[:, 0]
    return lm_input, lm_target, lm_len


def qwen2lm_forward_train(
    p: P,
    cfg: Qwen2LMConfig,
    batch: Dict[str, jax.Array],
    ctx: Ctx,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Training forward (llm.py:346-378).  ``rng`` drives the per-sample
    uni/bistream coin flip; None forces unistream."""
    text_token = batch["text_token"]
    tl_vec = batch["text_token_len"].astype(jnp.int32)
    speech_token = batch["speech_token"]
    sl_vec = batch["speech_token_len"].astype(jnp.int32)
    B = text_token.shape[0]

    qp = p.sub("llm.model.model")
    text_emb = embedding(qp, "embed_tokens", text_token)
    speech_emb = embedding(p, "speech_embedding", jnp.maximum(speech_token, 0))

    Tt, Ts = text_token.shape[1], speech_token.shape[1]
    S = 2 + Tt + Ts
    pos = jnp.arange(S)[None, :]
    tl = tl_vec[:, None]
    sl = sl_vec[:, None]
    dt = text_emb.dtype
    sos = p["llm_embedding.weight"][cfg.sos_eos].astype(dt)[None, None]
    task = p["llm_embedding.weight"][cfg.task_id].astype(dt)[None, None]

    uni = _pack_unistream(cfg, pos, tl, sl, text_emb, speech_emb, speech_token, sos, task)
    bi = _pack_bistream(cfg, pos, tl, sl, text_emb, speech_emb, speech_token, sos, task)

    if rng is not None:
        coin = jax.random.uniform(rng, (B,)) < 0.5
    else:
        coin = jnp.zeros((B,), bool)
    use_bi = coin & (sl_vec * cfg.mix_ratio[0] > tl_vec * cfg.mix_ratio[1])
    lm_input = jnp.where(use_bi[:, None, None], bi[0], uni[0])
    lm_target = jnp.where(use_bi[:, None], bi[1], uni[1])
    lm_len = uni[2]  # identical lengths by construction

    hidden = qwen2_forward(qp, cfg.qwen, lm_input, lm_len, ctx)
    logits = dense(p, "llm_decoder", hidden, ctx)
    # mask positions beyond lm_len out of the loss via target IGNORE (already)
    loss = label_smoothing_loss(logits, lm_target, cfg.lsm_weight, cfg.length_normalized_loss)
    acc = th_accuracy(logits, lm_target)
    return {"loss": loss, "acc": acc}


def qwen2lm_forward_dpo(
    p: P,
    cfg: Qwen2LMConfig,
    batch: Dict[str, jax.Array],
    ctx: Ctx,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """DPO forward (llm.py:380-425): runs chosen and rejected continuations
    through the LM and returns per-sample mean target log-probs for the DPO
    loss (models.gan.dpo_loss)."""
    B = batch["text_token"].shape[0]
    double = {
        "text_token": jnp.concatenate([batch["text_token"], batch["text_token"]], axis=0),
        "text_token_len": jnp.concatenate([batch["text_token_len"], batch["text_token_len"]], axis=0),
        "speech_token": jnp.concatenate([batch["speech_token"], batch["reject_speech_token"]], axis=0),
        "speech_token_len": jnp.concatenate(
            [batch["speech_token_len"], batch["reject_speech_token_len"]], axis=0),
    }
    # rebuild the packed inputs/targets (unistream/bistream per sample)
    text_token = double["text_token"]
    tl_vec = double["text_token_len"].astype(jnp.int32)
    speech_token = double["speech_token"]
    sl_vec = double["speech_token_len"].astype(jnp.int32)
    qp = p.sub("llm.model.model")
    text_emb = embedding(qp, "embed_tokens", text_token)
    speech_emb = embedding(p, "speech_embedding", jnp.maximum(speech_token, 0))
    S = 2 + text_token.shape[1] + speech_token.shape[1]
    pos = jnp.arange(S)[None, :]
    dt = text_emb.dtype
    sos = p["llm_embedding.weight"][cfg.sos_eos].astype(dt)[None, None]
    task = p["llm_embedding.weight"][cfg.task_id].astype(dt)[None, None]
    uni = _pack_unistream(cfg, pos, tl_vec[:, None], sl_vec[:, None],
                          text_emb, speech_emb, speech_token, sos, task)
    bi = _pack_bistream(cfg, pos, tl_vec[:, None], sl_vec[:, None],
                        text_emb, speech_emb, speech_token, sos, task)
    if rng is not None:
        coin = jnp.tile(jax.random.uniform(rng, (B,)) < 0.5, 2)
    else:
        coin = jnp.zeros((2 * B,), bool)
    use_bi = coin & (sl_vec * cfg.mix_ratio[0] > tl_vec * cfg.mix_ratio[1])
    lm_input = jnp.where(use_bi[:, None, None], bi[0], uni[0])
    lm_target = jnp.where(use_bi[:, None], bi[1], uni[1])

    hidden = qwen2_forward(qp, cfg.qwen, lm_input, uni[2], ctx)
    logits = dense(p, "llm_decoder", hidden, ctx)

    chosen_logits, rejected_logits = logits[:B], logits[B:]
    chosen_tgt, rejected_tgt = lm_target[:B], lm_target[B:]
    loss = label_smoothing_loss(chosen_logits, chosen_tgt, cfg.lsm_weight,
                                cfg.length_normalized_loss)
    acc = th_accuracy(chosen_logits, chosen_tgt)

    def mean_logps(lg, tgt):
        # NOTE: the reference averages log-probs over the IGNORE mask — an
        # acknowledged quirk (llm.py:419-424) reproduced verbatim for parity.
        mask = tgt == IGNORE_ID
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        safe = jnp.where(mask, 0, tgt)
        token_lp = jnp.take_along_axis(logp, safe[:, :, None], axis=-1)[:, :, 0]
        return jnp.sum(token_lp * mask, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1)

    return {
        "loss": loss,
        "acc": acc,
        "chosen_logps": mean_logps(chosen_logits, chosen_tgt),
        "rejected_logps": mean_logps(rejected_logits, rejected_tgt),
    }


# ---------------------------------------------------------------------------
# AR decode
# ---------------------------------------------------------------------------


class DecodeResult(NamedTuple):
    tokens: jax.Array
    length: jax.Array


def qwen2lm_decode(
    p: P,
    cfg: Qwen2LMConfig,
    rng: jax.Array,
    prefix_emb: jax.Array,  # (1, L0, D) [sos, text, task, prompt_speech]
    min_len: jax.Array,
    max_len: int,
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
    stop_at=None,
    state=None,
    return_state: bool = False,
):
    """Fixed-capacity while-loop decode with GQA caches (llm.py:495-511).

    ``stop_at``/``state``/``return_state`` give segment-wise (streaming)
    decode with bit-identical token streams — see models.llm.llm_decode.
    Note ``stop_at`` bounds the step counter ``i`` (attempts incl. skipped
    fill tokens), matching the non-streaming loop's bound."""
    q = cfg.qwen
    L0 = prefix_emb.shape[1]
    S = L0 + max_len
    dt = prefix_emb.dtype
    eos = cfg.speech_token_size
    nl = q.num_hidden_layers
    qp = p.sub("llm.model.model")

    def sample(rng_i, logits, step_i, tokens, ntok):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        mask_eos = step_i < min_len
        logp = logp.at[eos].set(jnp.where(mask_eos, -jnp.inf, logp[eos]))
        return ras_sample(rng_i, logp, tokens, ntok, top_p, top_k, win_size, tau_r)

    if state is None:
        # ---- prefill (keys span the full S-capacity cache) ----
        k_buf = jnp.zeros((nl, 1, q.num_key_value_heads, S, q.head_dim), dt)
        v_buf = jnp.zeros((nl, 1, q.num_key_value_heads, S, q.head_dim), dt)
        causal = jnp.arange(S)[None, :] <= jnp.arange(L0)[:, None]
        bias0 = M.mask_to_bias(causal[None], dt)
        positions0 = jnp.arange(L0)
        h = prefix_emb
        for i in range(nl):
            h, (kb, vb) = qwen2_layer(
                qp.sub(f"layers.{i}"), q, h, positions0, bias0, EVAL,
                kv_cache=(k_buf[i], v_buf[i]), cache_index=0)
            k_buf = k_buf.at[i].set(kb)
            v_buf = v_buf.at[i].set(vb)
        h = rms_norm(qp, "norm", h, q.rms_norm_eps)
        logits0 = dense(p, "llm_decoder", h[:, -1])[0]

        tokens = jnp.full((max_len,), -1, jnp.int32)
        k_s, rng = jax.random.split(rng)
        # step 0 has no previous token to re-feed on a fill-token skip, so
        # fill/invalid ids (> eos) are masked out of the first sample — the
        # reference's step-0 `continue` would re-feed the ENTIRE prefix into
        # the cache (llm.py:505-507), which is not skip semantics either
        logits0 = logits0.at[eos + 1:].set(-jnp.inf)
        first = sample(k_s, logits0, jnp.asarray(0), tokens,
                       jnp.asarray(0)).astype(jnp.int32)
        is_special0 = first >= eos
        tokens = jnp.where(is_special0, tokens, tokens.at[0].set(first))
        n0 = jnp.where(is_special0, 0, 1)
        state = (jnp.asarray(1), n0, tokens, first, k_buf, v_buf, rng,
                 first == eos)

    stop = jnp.asarray(max_len) if stop_at is None else jnp.minimum(
        jnp.asarray(stop_at), max_len)

    def cond_fn(state):
        i, n, tokens, last, kb, vb, rng, done = state
        return (~done) & (i < stop)

    def body(state):
        i, n, tokens, last, kb, vb, rng, done = state
        L = L0 + i - 1  # this step's cache slot / absolute position
        x = embedding(p, "speech_embedding", jnp.maximum(last, 0)[None, None]).astype(dt)
        kpos = jnp.arange(S)[None, None, :]
        bias = jnp.where(kpos <= L, 0.0, M.NEG_BIAS).astype(dt)
        positions = jnp.full((1,), L)
        h = x
        new_kb, new_vb = kb, vb
        for li in range(nl):
            h, (kli, vli) = qwen2_layer(
                qp.sub(f"layers.{li}"), q, h, positions, bias, EVAL,
                kv_cache=(new_kb[li], new_vb[li]), cache_index=L)
            new_kb = new_kb.at[li].set(kli)
            new_vb = new_vb.at[li].set(vli)
        h = rms_norm(qp, "norm", h, q.rms_norm_eps)
        logits = dense(p, "llm_decoder", h[:, -1])[0]
        k_i, rng = jax.random.split(rng)
        tok = sample(k_i, logits, i, tokens, n).astype(jnp.int32)
        is_eos = tok == eos
        is_skip = tok > eos  # fill tokens: not stored, not fed (llm.py:506-507)
        tokens = jnp.where(is_eos | is_skip, tokens, tokens.at[n].set(tok))
        n = jnp.where(is_eos | is_skip, n, n + 1)
        last = jnp.where(is_skip, last, tok)
        return (i + 1, n, tokens, last, new_kb, new_vb, rng, is_eos)

    out = jax.lax.while_loop(cond_fn, body, state)
    _, n, tokens_o, _, _, _, _, done = out
    result = DecodeResult(tokens=tokens_o, length=n)
    if return_state:
        return result, out
    return result


class Qwen2StreamDecoder:
    """Host-driven incremental decoder for bistream (streaming text) inference.

    Wraps fixed-capacity GQA caches with a jitted, length-bucketed ``advance``:
    feed a (padded) segment of input embeddings, get the last valid position's
    logits.  The bistream control flow (reference: llm.py:513-611) runs on the
    host in ``qwen2lm_inference_bistream``.
    """

    def __init__(self, p: P, cfg: Qwen2LMConfig, capacity: int = 2048,
                 dtype=jnp.float32):
        self.p = p
        self.cfg = cfg
        self.capacity = capacity
        q = cfg.qwen
        self.k_buf = jnp.zeros((q.num_hidden_layers, 1, q.num_key_value_heads,
                                capacity, q.head_dim), dtype)
        self.v_buf = jnp.zeros_like(self.k_buf)
        self.L = 0
        self._advance_cache = {}

    def _advance_fn(self, seg_len: int):
        if seg_len in self._advance_cache:
            return self._advance_cache[seg_len]
        p, cfg, S = self.p, self.cfg, self.capacity
        q = cfg.qwen
        qp = p.sub("llm.model.model")

        def advance(k_buf, v_buf, emb, start, valid):
            # emb: (1, seg_len, D) padded; positions start..start+valid-1 valid
            positions = start + jnp.arange(seg_len)
            kpos = jnp.arange(S)[None, :]
            qpos = positions[:, None]
            bias = jnp.where((kpos <= qpos) & (kpos < start + valid), 0.0, M.NEG_BIAS)[None]
            h = emb
            for i in range(q.num_hidden_layers):
                h, (kb, vb) = qwen2_layer(
                    qp.sub(f"layers.{i}"), q, h, positions, bias, EVAL,
                    kv_cache=(k_buf[i], v_buf[i]), cache_index=start)
                k_buf = k_buf.at[i].set(kb)
                v_buf = v_buf.at[i].set(vb)
            h = rms_norm(qp, "norm", h, q.rms_norm_eps)
            logits = dense(p, "llm_decoder", h[0])  # (seg_len, V)
            return k_buf, v_buf, logits[jnp.maximum(valid - 1, 0)]

        fn = jax.jit(advance, donate_argnums=(0, 1))
        self._advance_cache[seg_len] = fn
        return fn

    def advance(self, emb: jax.Array) -> jax.Array:
        """Feed (1, n, D) embeddings; returns last-position logits (V,)."""
        n = emb.shape[1]
        if self.L + n > self.capacity:
            # a clamped dynamic_update_slice would silently overwrite earlier
            # cache columns while RoPE positions keep advancing — corrupt
            # attention, garbage tokens; fail loudly instead
            raise ValueError(
                f"bistream sequence overflows the decoder capacity: "
                f"{self.L} + {n} > {self.capacity}")
        bucket = 1 if n == 1 else 1 << (n - 1).bit_length()  # pow2 buckets
        pad = bucket - n
        if pad:
            emb = jnp.pad(emb, ((0, 0), (0, pad), (0, 0)))
        fn = self._advance_fn(bucket)
        self.k_buf, self.v_buf, logits = fn(self.k_buf, self.v_buf, emb,
                                            jnp.asarray(self.L), jnp.asarray(n))
        self.L += n
        return logits


def qwen2lm_inference_bistream(
    p: P,
    cfg: Qwen2LMConfig,
    rng: jax.Array,
    text_chunks,  # iterable of (1, n) int arrays — streaming text tokens
    prompt_text: Optional[jax.Array] = None,  # (1, Tp)
    prompt_speech_token: Optional[jax.Array] = None,  # (1, Ts)
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
    capacity: int = 2048,
    max_history: int = 4096,
    max_tokens: int = 100000,
):
    """Streaming-text generator yielding speech tokens as text arrives
    (reference: llm.py:513-611 inference_bistream)."""
    import numpy as np

    q = cfg.qwen
    qp = p.sub("llm.model.model")
    m0, m1 = cfg.mix_ratio
    eos = cfg.speech_token_size
    fill = cfg.speech_token_size + 2

    def embed_text(ids):
        return embedding(qp, "embed_tokens", jnp.asarray(ids, jnp.int32))

    def embed_speech(ids):
        return embedding(p, "speech_embedding", jnp.asarray(ids, jnp.int32))

    dec = Qwen2StreamDecoder(p, cfg, capacity)
    sos = p["llm_embedding.weight"][cfg.sos_eos][None, None]
    task = p["llm_embedding.weight"][cfg.task_id][None, None]

    pending = [sos]  # embeddings not yet fed
    text_cache = embed_text(prompt_text) if prompt_text is not None and prompt_text.size \
        else jnp.zeros((1, 0, cfg.llm_input_size))
    speech_cache = embed_speech(prompt_speech_token) \
        if prompt_speech_token is not None and prompt_speech_token.size \
        else jnp.zeros((1, 0, cfg.llm_input_size))

    out_tokens: list[int] = []
    # the history buffer must cover every token the loop may generate:
    # writes past the buffer are silently dropped scatters, which would
    # disable repetition-aware sampling exactly in the long-stream regime
    history = jnp.full((max(max_history, max_tokens),), -1, jnp.int32)
    next_fill_index = -1
    n_rng = 0

    def sample(logits, ignore_eos=True):
        # The reference raises on sampling speech_token_size+1 (llm.py:585-589)
        # and on fill in the final loop; masking those ids at the sampler is
        # the robust equivalent — a trained model never emits them there.
        nonlocal n_rng
        n_rng += 1
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        logp = logp.at[eos + 1].set(-jnp.inf)
        if ignore_eos:
            logp = logp.at[eos].set(-jnp.inf)
        else:
            logp = logp.at[fill].set(-jnp.inf)
        tok = ras_sample(jax.random.fold_in(rng, n_rng), logp, history,
                         jnp.asarray(len(out_tokens)), top_p, top_k, win_size, tau_r)
        return int(tok)

    def flush_pending():
        nonlocal pending
        if pending:
            seg = jnp.concatenate(pending, axis=1)
            pending = []
            return dec.advance(seg)
        return None

    for chunk in text_chunks:
        text_cache = jnp.concatenate([text_cache, embed_text(chunk)], axis=1)
        # interleave [m0 text | m1 speech] while prompt speech remains
        while speech_cache.shape[1] != 0 and text_cache.shape[1] >= m0:
            pending.append(text_cache[:, :m0])
            pending.append(speech_cache[:, :m1])
            text_cache = text_cache[:, m0:]
            speech_cache = speech_cache[:, m1:]
        if speech_cache.shape[1] != 0:
            continue  # need more text to pair with remaining prompt speech
        # need a text block before decoding after a fill (or at the start)
        need_text = (out_tokens and out_tokens[-1] == fill) or \
                    (not out_tokens and len(pending) == 1 and dec.L == 0)
        if need_text:
            if text_cache.shape[1] < m0:
                continue
            if out_tokens and out_tokens[-1] == fill:
                pending = [text_cache[:, :m0]]
            else:
                pending.append(text_cache[:, :m0])
            text_cache = text_cache[:, m0:]
        while True:
            logits = flush_pending()
            if logits is None:
                logits = dec.advance(embed_speech(jnp.asarray([[out_tokens[-1]]])))
            if next_fill_index != -1 and len(out_tokens) == next_fill_index:
                tok = fill
                next_fill_index += m1 + 1
            else:
                tok = sample(logits, ignore_eos=True)
            if tok == fill:
                next_fill_index = len(out_tokens) + m1 + 1
            out_tokens.append(tok)
            history = history.at[len(out_tokens) - 1].set(tok)
            if tok >= eos:
                if tok == fill:
                    break
                raise ValueError(f"should not get token {tok}")
            yield tok
            pending = [embed_speech(jnp.asarray([[tok]]))]

    # final decode: remaining text + task, until EOS
    if text_cache.shape[1]:
        pending.append(text_cache)
    pending.append(task)
    while len(out_tokens) < max_tokens and dec.L < capacity - 2:
        logits = flush_pending()
        if logits is None:
            logits = dec.advance(embed_speech(jnp.asarray([[out_tokens[-1]]])))
        tok = sample(logits, ignore_eos=False)
        out_tokens.append(tok)
        history = history.at[len(out_tokens) - 1].set(tok)
        if tok >= eos:
            if tok == eos:
                break
            raise ValueError(f"should not get token {tok}")
        yield tok
        pending = [embed_speech(jnp.asarray([[tok]]))]


def init_qwen2lm_params(key: jax.Array, cfg: Qwen2LMConfig) -> Params:
    d: Params = {}
    kg = KeyGen(key)
    for k, v in init_qwen2_params(kg(), cfg.qwen, prefix="llm.model.model").items():
        d[k] = v
    init_embedding(kg(), d, "llm_embedding", 2, cfg.llm_input_size)
    init_linear(kg(), d, "llm_decoder", cfg.llm_output_size, cfg.speech_token_size + 3)
    init_embedding(kg(), d, "speech_embedding", cfg.speech_token_size + 3, cfg.llm_input_size)
    return d


class BatchDecodeState(NamedTuple):
    """Resumable lock-step state for segment-wise batched CosyVoice2 decode.

    Cache columns and RoPE positions are SLOT-LOCAL (``lens`` counts a
    slot's own decode attempts): slot ``b``'s prefix occupies columns
    ``[0, L0)`` of its own batch row and attempt ``a``'s key goes to column
    ``L0 + a`` — the solo decode layout vmapped.  ``i`` only counts loop
    steps (segment scheduling), so continuous-batching admission is
    runway-free (see models.llm.BatchDecodeState)."""
    i: jax.Array  # loop-step counter (segment scheduling only)
    n: jax.Array  # (B,) emitted token counts (fill tokens skipped)
    tokens: jax.Array  # (B, max_len)
    last: jax.Array  # (B,) previous token ids
    k_buf: jax.Array  # (nl, B, kvH, S, dk)
    v_buf: jax.Array
    rngs: jax.Array  # (B, 2)
    done: jax.Array  # (B,) bool
    lens: jax.Array  # (B,) slot-local attempt counts (drive cache columns)


class BatchDecodeResult(NamedTuple):
    tokens: jax.Array  # (B, max_len) int32, -1 padded
    lengths: jax.Array  # (B,) valid counts


def qwen2lm_decode_batch(
    p: P,
    cfg: Qwen2LMConfig,
    rng: jax.Array,
    prefix_emb: jax.Array,  # (B, L0, D) LEFT-padded prefixes
    prefix_valid: jax.Array,  # (B,) valid prefix lengths (right-aligned)
    min_len: jax.Array,  # (B,)
    max_len: int,
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
    max_lens: Optional[jax.Array] = None,  # (B,) per-sample caps <= max_len
    stop_at: Optional[jax.Array] = None,  # scalar — pause the cohort here
    state: Optional["BatchDecodeState"] = None,
    return_state: bool = False,
    attend_width: Optional[int] = None,  # static: read only this many cache cols
):
    """Batched CosyVoice2 decode (see models.llm.llm_decode_batch for the
    left-padding/rng contract).  GQA caches; fill tokens (> eos) are skipped
    per sample (not stored, not fed back — llm.py:506-507), so per-sample
    output counts advance independently of attempt counts.

    Segment-wise streaming cohorts: ``stop_at`` bounds LOOP STEPS,
    ``return_state=True`` yields a resumable :class:`BatchDecodeState`;
    token streams are bit-identical to an uninterrupted run.

    Continuous batching: cache columns, RoPE positions, attempt counters,
    and min-length masking are all SLOT-LOCAL (``state.lens``), so an
    admitted slot (:func:`qwen2lm_admit_slot`) runs exactly the solo decode
    vmapped — no shared-runway constraint, and every slot gets the solo
    run's full ``max_len`` attempt budget regardless of when it joined."""
    q = cfg.qwen
    B, L0 = prefix_emb.shape[0], prefix_emb.shape[1]
    S = L0 + max_len
    dt = prefix_emb.dtype
    eos = cfg.speech_token_size
    nl = q.num_hidden_layers
    qp = p.sub("llm.model.model")
    start = (L0 - prefix_valid.astype(jnp.int32))  # (B,) first valid key col
    # attend_width W: decode steps read only cache columns [0, W) — EXACT as
    # long as every key written this call lives below W (W >= L0 + max(lens)
    # reached within the call); see models.llm.llm_decode_batch.  Per-token
    # HBM traffic is then W-proportional instead of S-proportional.
    W = S if attend_width is None else max(L0 + 1, min(attend_width, S))

    def sample_one(rng_i, logits, step_i, tokens_b, ntok, min_b):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        mask_eos = step_i < min_b
        logp = logp.at[eos].set(jnp.where(mask_eos, -jnp.inf, logp[eos]))
        return ras_sample(rng_i, logp, tokens_b, ntok, top_p, top_k,
                          win_size, tau_r)

    sample_vec = jax.vmap(sample_one, in_axes=(0, 0, 0, 0, 0, 0))
    split2 = jax.vmap(jax.random.split)
    caps = (jnp.full((B,), max_len, jnp.int32) if max_lens is None
            else jnp.minimum(jnp.asarray(max_lens, jnp.int32), max_len))

    if state is None:
        # ---- prefill (pad keys masked; outputs read at the right-aligned
        # end) ----
        k_buf = jnp.zeros((nl, B, q.num_key_value_heads, S, q.head_dim), dt)
        v_buf = jnp.zeros_like(k_buf)
        kq = jnp.arange(S)[None, None, :]
        vis0 = (kq <= jnp.arange(L0)[None, :, None]) & (kq >= start[:, None, None])
        bias0 = M.mask_to_bias(vis0, dt)  # (B, L0, S)
        positions0 = jnp.arange(L0)
        h = prefix_emb
        for i in range(nl):
            h, (kb, vb) = qwen2_layer(
                qp.sub(f"layers.{i}"), q, h, positions0, bias0, EVAL,
                kv_cache=(k_buf[i], v_buf[i]), cache_index=0)
            k_buf = k_buf.at[i].set(kb)
            v_buf = v_buf.at[i].set(vb)
        h = rms_norm(qp, "norm", h, q.rms_norm_eps)
        logits0 = dense(p, "llm_decoder", h[:, -1])  # (B, V)

        tokens = jnp.full((B, max_len), -1, jnp.int32)
        rngs = jax.vmap(lambda b: jax.random.fold_in(rng, b))(jnp.arange(B))
        ks = split2(rngs)
        k_s, rngs = ks[:, 0], ks[:, 1]
        zeros_b = jnp.zeros((B,), jnp.int32)
        # step-0 fill skip is unrepresentable (no previous token) — mask >eos
        logits0 = logits0.at[:, eos + 1:].set(-jnp.inf)
        first = sample_vec(k_s, logits0, zeros_b, tokens,
                           zeros_b, min_len).astype(jnp.int32)
        is_special0 = first >= eos
        tokens = tokens.at[:, 0].set(jnp.where(is_special0, -1, first))
        n0 = jnp.where(is_special0, 0, 1)
        done0 = (first == eos) | (caps <= 1)
        state = BatchDecodeState(
            i=jnp.asarray(1), n=n0, tokens=tokens, last=jnp.maximum(first, 0),
            k_buf=k_buf, v_buf=v_buf, rngs=rngs, done=done0,
            lens=jnp.ones((B,), jnp.int32))

    # stop bounds LOOP STEPS (segment scheduling); per-slot attempts are
    # bounded below by lens >= max_len, so i may exceed max_len across a
    # long-lived engine state
    stop = jnp.asarray(max_len) if stop_at is None else jnp.asarray(stop_at)

    def cond(st):
        return jnp.any(~st.done) & (st.i < stop)

    def body(st):
        i, n, tokens, last, kb, vb, rngs, done, lens = st
        L_vec = L0 + lens - 1  # (B,) this attempt's key column, slot-local
        x = embedding(p, "speech_embedding",
                      jnp.maximum(last, 0)[:, None]).astype(dt)  # (B, 1, D)
        kpos = jnp.arange(W)[None, :]
        bias = jnp.where((kpos <= L_vec[:, None]) & (kpos >= start[:, None]),
                         0.0, M.NEG_BIAS).astype(dt)[:, None, :]  # (B, 1, W)
        positions = L_vec[:, None]  # (B, 1) per-slot RoPE positions
        h = x
        new_kb, new_vb = kb, vb
        for li in range(nl):
            h, (kli, vli) = qwen2_layer(
                qp.sub(f"layers.{li}"), q, h, positions, bias, EVAL,
                kv_cache=(new_kb[li, :, :, :W], new_vb[li, :, :, :W]),
                cache_index=L_vec)
            new_kb = new_kb.at[li, :, :, :W].set(kli)
            new_vb = new_vb.at[li, :, :, :W].set(vli)
        h = rms_norm(qp, "norm", h, q.rms_norm_eps)
        logits = dense(p, "llm_decoder", h[:, -1])  # (B, V)
        ks = split2(rngs)
        k_i, rngs = ks[:, 0], ks[:, 1]
        li = lens  # (B,) per-slot LOCAL attempt step
        tok = sample_vec(k_i, logits, li, tokens, n, min_len).astype(jnp.int32)
        is_eos = tok == eos
        is_skip = tok > eos
        write = ~(done | is_eos | is_skip)
        cur = tokens[jnp.arange(B), n]
        tokens = tokens.at[jnp.arange(B), n].set(jnp.where(write, tok, cur))
        n = jnp.where(write, n + 1, n)
        last = jnp.where(is_skip | done, last, tok)
        lens = lens + jnp.where(done, 0, 1)
        # a slot's attempt budget is the solo run's max_len; exhausting it
        # finalizes the slot with whatever it has emitted (the old shared
        # counter cut EVERY slot at max_len total steps since park, giving
        # late joiners a truncated budget)
        done = done | is_eos | (n >= caps) | (lens >= max_len)
        return BatchDecodeState(i + 1, n, tokens, last, new_kb, new_vb, rngs,
                                done, lens)

    out = jax.lax.while_loop(cond, body, state)
    result = BatchDecodeResult(tokens=out.tokens, lengths=out.n)
    if return_state:
        return result, out
    return result


def qwen2lm_admit_slot(
    p: P,
    cfg: Qwen2LMConfig,
    state: BatchDecodeState,
    prefix_emb: jax.Array,  # (1, L0, D) LEFT-padded to the cohort's L0
    prefix_valid: jax.Array,  # scalar
    rng_req: jax.Array,  # the request's OWN decode key
    slot: jax.Array,  # scalar slot index
    cap: jax.Array,  # scalar per-request emitted-token cap
    min_len_req: jax.Array,  # scalar (CV2 masks EOS at step 0 iff min>0)
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
):
    """Admit one request into a paused CosyVoice2 cohort (continuous
    batching — see llm.llm_admit_slot for the design).  Cache columns and
    RoPE positions are slot-local, so the newcomer prefills at positions
    ``arange(L0)`` into columns ``[0, L0)`` of its own cache row — exactly
    the solo prefill — and ``lens[slot]`` resets to 1.  Admission is
    runway-free."""
    q = cfg.qwen
    D = cfg.llm_input_size
    L0 = prefix_emb.shape[1]
    max_len = state.tokens.shape[1]
    dt = prefix_emb.dtype
    eos = cfg.speech_token_size
    nl = q.num_hidden_layers
    qp = p.sub("llm.model.model")

    # ---- B=1 prefill at slot-local RoPE positions (the solo layout) ----
    start1 = L0 - prefix_valid.astype(jnp.int32)
    kq = jnp.arange(L0)
    vis = (kq[None, None, :] <= kq[None, :, None]) & (kq[None, None, :] >= start1)
    bias0 = M.mask_to_bias(vis, dt)  # (1, L0, L0)
    positions0 = jnp.arange(L0)
    kb1 = jnp.zeros((nl, 1, q.num_key_value_heads, L0, q.head_dim), dt)
    vb1 = jnp.zeros_like(kb1)
    h = prefix_emb
    for i in range(nl):
        h, (kb, vb) = qwen2_layer(
            qp.sub(f"layers.{i}"), q, h, positions0, bias0, EVAL,
            kv_cache=(kb1[i], vb1[i]), cache_index=0)
        kb1 = kb1.at[i].set(kb)
        vb1 = vb1.at[i].set(vb)
    h = rms_norm(qp, "norm", h, q.rms_norm_eps)
    logits0 = dense(p, "llm_decoder", h[:, -1])[0]  # (V,)

    # ---- first token with the request's own stream (solo-identical) ----
    k_s, k_rest = jax.random.split(rng_req)
    row = jnp.full((max_len,), -1, jnp.int32)
    logp = jax.nn.log_softmax(logits0.astype(jnp.float32))
    logp = logp.at[eos].set(
        jnp.where(jnp.asarray(0) < min_len_req, -jnp.inf, logp[eos]))
    logp = logp.at[eos + 1:].set(-jnp.inf)  # step-0 fill skip unrepresentable
    first = ras_sample(k_s, logp, row, jnp.asarray(0), top_p, top_k,
                       win_size, tau_r).astype(jnp.int32)
    is_special0 = first >= eos
    row = row.at[0].set(jnp.where(is_special0, -1, first))
    n0 = jnp.where(is_special0, 0, 1).astype(state.n.dtype)

    # ---- splice into the cohort state (state.i untouched) ----
    slot = jnp.asarray(slot, jnp.int32)
    z = jnp.int32(0)
    k_buf = jax.lax.dynamic_update_slice(
        state.k_buf, kb1.astype(state.k_buf.dtype), (z, slot, z, z, z))
    v_buf = jax.lax.dynamic_update_slice(
        state.v_buf, vb1.astype(state.v_buf.dtype), (z, slot, z, z, z))
    tokens = jax.lax.dynamic_update_slice(state.tokens, row[None], (slot, z))
    last = state.last.at[slot].set(jnp.maximum(first, 0))
    rngs = state.rngs.at[slot].set(k_rest)
    n = state.n.at[slot].set(n0)
    done = state.done.at[slot].set((first == eos) | (jnp.asarray(cap) <= 1))
    lens = state.lens.at[slot].set(1)
    return BatchDecodeState(state.i, n, tokens, last, k_buf, v_buf, rngs,
                            done, lens)
