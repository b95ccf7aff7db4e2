"""Speech-token LLM (TransformerLM): text -> 50 Hz speech tokens.

Reference behavior: cosyvoice/llm/llm.py:32-228 and the no-prompt joint
variant llm_flow_model.py:109-179.  TPU-first re-design:

- the ragged unpad/concat sequence assembly (llm.py:88-95 pad_unpad_sequence)
  becomes a dense masked packing with static shapes: gathers + where-selects
  build [sos, spk, text_enc, task_id, speech_emb] per row in one shot;
- autoregressive decode is a single jitted ``lax.while_loop`` over a
  fixed-capacity KV cache (dynamic_update_slice writes) with RAS sampling
  in-loop; EOS rejection before min_len (llm.py:147-162 retry loop) is
  realized exactly as renormalized sampling with the EOS logit masked;
- per-layer positional projections are hoisted out of the decode loop.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LLMConfig
from ..ctx import Ctx, EVAL
from ..params import P, Params, KeyGen, init_linear, init_embedding
from ..ops import masks as M
from ..ops.sampling import ras_sample
from ..layers.basic import dense, embedding, layer_norm
from ..layers.attention import _split_heads
from ..layers.conformer import encoder_forward, init_encoder, transformer_layer
from ..layers.posenc import rel_pos_table

IGNORE_ID = -1  # reference: cosyvoice/utils/common.py:26


def _l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def _token_embed_legacy(sp_llm: P, D: int, dt):
    """linear_legacy input embed (Linear+LN+ReLU, then xscale) — the ONE
    definition shared by solo decode, batched decode, and slot admission so
    their bit-identical guarantee cannot silently desynchronize."""
    def embed_tokens(x):
        sp = sp_llm.sub("embed")
        x = dense(sp, "out.0", x)
        x = layer_norm(sp, "out.1", x, eps=1e-5)
        x = jax.nn.relu(x)
        return x * jnp.asarray(D, dt) ** 0.5

    return embed_tokens


# ---------------------------------------------------------------------------
# Text encoding
# ---------------------------------------------------------------------------


def llm_encode_text(p: P, cfg: LLMConfig, text_token: jax.Array, text_len: jax.Array, ctx: Ctx):
    """text_embedding -> causal Conformer -> affine (llm.py:78-86, 120-122)."""
    emb = embedding(p, "text_embedding", text_token)
    h, _ = encoder_forward(p.sub("text_encoder"), cfg.text_encoder, emb, text_len, ctx,
                           decoding_chunk_size=1, num_decoding_left_chunks=-1,
                           conformer=True)
    return dense(p, "text_encoder_affine_layer", h, ctx)


# ---------------------------------------------------------------------------
# Dense packing (replaces pad_unpad_sequence)
# ---------------------------------------------------------------------------


def pack_lm_inputs(
    p: P,
    cfg: LLMConfig,
    text_enc: jax.Array,  # (B, Tt, D) encoded text
    text_len: jax.Array,  # (B,)
    spk_emb: jax.Array,  # (B, D) projected speaker embedding
    speech_emb: jax.Array,  # (B, Ts, D)
    speech_len: jax.Array,  # (B,)
    speech_token: jax.Array,  # (B, Ts) int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Build (lm_input (B,S,D), lm_len (B,), lm_target (B,S)) densely.

    Layout per row (llm.py:88-95, 116-118):
        input : [sos, spk, text_0..text_{tl-1}, task, sp_0..sp_{sl-1}, pad]
        target: [IGNORE x (2+tl),              sp_0..sp_{sl-1}, EOS,  IGNORE]
    """
    B, Tt, D = text_enc.shape
    Ts = speech_emb.shape[1]
    S = 3 + Tt + Ts
    dt = text_enc.dtype

    sos = p["llm_embedding.weight"][cfg.sos_eos].astype(dt)
    task = p["llm_embedding.weight"][cfg.task_id].astype(dt)

    pos = jnp.arange(S)[None, :]  # (1, S)
    tl = text_len.astype(jnp.int32)[:, None]
    sl = speech_len.astype(jnp.int32)[:, None]

    text_idx = jnp.clip(pos - 2, 0, Tt - 1)
    speech_idx = jnp.clip(pos - 3 - tl, 0, Ts - 1)
    g_text = jnp.take_along_axis(text_enc, jnp.broadcast_to(text_idx, (B, S))[:, :, None], axis=1)
    g_speech = jnp.take_along_axis(speech_emb, speech_idx[:, :, None], axis=1)

    is_sos = pos == 0
    is_spk = pos == 1
    is_text = (pos >= 2) & (pos < 2 + tl)
    is_task = pos == 2 + tl
    is_speech = (pos > 2 + tl) & (pos < 3 + tl + sl)

    lm_input = jnp.where(
        is_sos[:, :, None], sos[None, None, :],
        jnp.where(
            is_spk[:, :, None], spk_emb[:, None, :],
            jnp.where(
                is_text[:, :, None], g_text,
                jnp.where(
                    is_task[:, :, None], task[None, None, :],
                    jnp.where(is_speech[:, :, None], g_speech, 0.0),
                ),
            ),
        ),
    )
    lm_len = (3 + tl + sl)[:, 0]

    tgt_idx = jnp.clip(pos - 2 - tl, 0, Ts - 1)
    g_tok = jnp.take_along_axis(speech_token, jnp.broadcast_to(jnp.where(pos - 2 - tl >= 0, tgt_idx, 0), (B, S)), axis=1)
    is_tgt_speech = (pos >= 2 + tl) & (pos < 2 + tl + sl)
    is_eos = pos == 2 + tl + sl
    lm_target = jnp.where(
        is_tgt_speech, g_tok,
        jnp.where(is_eos, cfg.speech_token_size, IGNORE_ID),
    )
    return lm_input, lm_len, lm_target


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


def label_smoothing_loss(
    logits: jax.Array,  # (B, S, V)
    target: jax.Array,  # (B, S) with IGNORE_ID padding
    smoothing: float = 0.0,
    normalize_length: bool = True,
) -> jax.Array:
    """KL(true_dist || softmax(logits)) with label smoothing
    (reference: transformer/label_smoothing_loss.py:21-96)."""
    B, S, V = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = target != IGNORE_ID
    tgt = jnp.where(valid, target, 0)

    confidence = 1.0 - smoothing
    low = smoothing / (V - 1)

    logp_tgt = jnp.take_along_axis(logp, tgt[:, :, None], axis=-1)[:, :, 0]
    if smoothing > 0.0:
        # kl = sum_v true*(log true - logp); split into target + others
        ent = confidence * jnp.log(confidence) + (V - 1) * low * jnp.log(low)
        kl = ent - (confidence - low) * logp_tgt - low * jnp.sum(logp, axis=-1)
    else:
        kl = -logp_tgt
    kl = jnp.where(valid, kl, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1) if normalize_length else B
    return jnp.sum(kl) / denom


def th_accuracy(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Argmax accuracy over non-ignored positions (common.py:78-97)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = target != IGNORE_ID
    correct = jnp.sum(jnp.where(valid & (pred == target), 1, 0))
    return correct / jnp.maximum(jnp.sum(valid), 1)


def llm_forward_train(
    p: P,
    cfg: LLMConfig,
    batch: Dict[str, jax.Array],
    ctx: Ctx,
) -> Dict[str, jax.Array]:
    """No-prompt training forward (llm_flow_model.py:109-179; same layout as
    the original llm.py:97-145).  Returns {'loss', 'acc'}."""
    text_token = batch["text_token"]
    text_len = batch["text_token_len"]
    speech_token = batch["speech_token"]
    speech_len = batch["speech_token_len"]
    spk = batch["embedding"]

    text_enc = llm_encode_text(p, cfg, text_token, text_len, ctx)
    spk_emb = dense(p, "spk_embed_affine_layer", _l2_normalize(spk, axis=1), ctx)
    speech_emb = embedding(p, "speech_embedding", jnp.maximum(speech_token, 0))

    lm_input, lm_len, lm_target = pack_lm_inputs(
        p, cfg, text_enc, text_len, spk_emb, speech_emb, speech_len, speech_token
    )

    lm_out, _ = encoder_forward(p.sub("llm"), cfg.llm, lm_input, lm_len, ctx, conformer=False)
    logits = dense(p, "llm_decoder", lm_out, ctx)

    loss = label_smoothing_loss(logits, lm_target, cfg.lsm_weight, cfg.length_normalized_loss)
    acc = th_accuracy(logits, lm_target)
    return {"loss": loss, "acc": acc}


# ---------------------------------------------------------------------------
# Autoregressive decode
# ---------------------------------------------------------------------------


class DecodeResult(NamedTuple):
    tokens: jax.Array  # (max_len,) int32, EOS-terminated, padded with -1
    length: jax.Array  # scalar int32 — number of valid tokens


class DecodeState(NamedTuple):
    """Resumable while-loop state for segment-wise (streaming) decode."""
    i: jax.Array  # next token index
    tokens: jax.Array  # (max_len,) buffer
    last: jax.Array  # previous token id
    kv_buf: jax.Array  # (nl, 2, H, S, dk)
    rng: jax.Array
    done: jax.Array  # bool — EOS emitted


# ---------------------------------------------------------------------------
# Fused decode-step helpers (shared by llm_decode / llm_decode_batch)
# ---------------------------------------------------------------------------


def _stack_decode_layers(sp_llm: P, nl: int, int8_weights: bool) -> Dict[str, jax.Array]:
    """Stack per-layer params into (nl, ...) arrays with QKV concatenated
    into one matmul; optionally int8 weight-only quantize the four big
    matrices (per-output-channel scales)."""
    _lp = sp_llm.prefix + "encoders.0."
    layer_names = sorted({k[len(_lp):] for k in sp_llm.d if k.startswith(_lp)})
    stacked = {n: jnp.stack(
        [sp_llm[f"encoders.{i}.{n}"] for i in range(nl)]) for n in layer_names}
    stacked["wqkv"] = jnp.concatenate(
        [stacked.pop("self_attn.linear_q.weight"),
         stacked.pop("self_attn.linear_k.weight"),
         stacked.pop("self_attn.linear_v.weight")], axis=1)  # (nl, 3D, D)
    stacked["bqkv"] = jnp.concatenate(
        [stacked.pop("self_attn.linear_q.bias"),
         stacked.pop("self_attn.linear_k.bias"),
         stacked.pop("self_attn.linear_v.bias")], axis=1)  # (nl, 3D)
    stacked.pop("self_attn.linear_pos.weight", None)  # hoisted into pos_ks
    if int8_weights:
        for name in ("wqkv", "self_attn.linear_out.weight",
                     "feed_forward.w_1.weight", "feed_forward.w_2.weight"):
            w32 = stacked[name].astype(jnp.float32)  # (nl, O, I)
            sc = jnp.maximum(
                jnp.max(jnp.abs(w32), axis=-1, keepdims=True) / 127.0, 1e-12)
            stacked[name] = jnp.clip(jnp.round(w32 / sc), -127, 127).astype(jnp.int8)
            stacked[name + "@scale"] = sc[..., 0].astype(jnp.float32)  # (nl, O)
    return stacked


def _matmul_q(x, ld, name):
    """x @ W^T (+ dequant) for a possibly-int8 stacked weight slice."""
    w = ld[name]
    if w.dtype == jnp.int8:
        return (x @ w.T.astype(x.dtype)) * ld[name + "@scale"].astype(x.dtype)
    return x @ w.T.astype(x.dtype)


# the six llm-block matmuls the reference's LLM LoRA config targets
# (config.py LLM_LORA_DEFAULT; lora.py substring matching)
_DECODE_LORA_MODS = ("self_attn.linear_q", "self_attn.linear_k",
                     "self_attn.linear_v", "self_attn.linear_out",
                     "feed_forward.w_1", "feed_forward.w_2")


def _stack_decode_loras(lora: Params, nl: int,
                        prefix: str = "llm.encoders") -> Dict[str, jax.Array]:
    """Layer-stack voice-stacked llm-block adapters for the decode scan.

    ``lora`` holds flat keys ``{prefix}.{i}.<module>.lora_A`` / ``.lora_B``
    whose values are VOICE-stacked ((V, r, in) / (V, out, r) —
    ``lora.stack_voice_loras``; a single un-stacked voice is wrapped as
    V=1).  Returns ``{f"{module}.A": (V, nl, r, in), f"{module}.B":
    (V, nl, out, r)}`` for every targeted module present (multi-voice
    continuous-batching decode — the TPU equivalent of vLLM multi-LoRA)."""
    # every adapter key outside the covered set would be applied in
    # training/prefill (via Ctx) but silently DROPPED by the decode loop —
    # tokens would diverge from the merged-weights build.  Fail loudly.
    # text_encoder.* adapters are prefill-only (the decode loop never runs
    # the text encoder) and stay Ctx-routed.
    unsupported = sorted({
        k for k in lora
        if ".lora_" in k and not k.startswith("text_encoder.")
        and not any(f".{mod}.lora_" in k for mod in _DECODE_LORA_MODS)})
    if unsupported:
        raise ValueError(
            "decode-loop LoRA routing covers the llm-block modules "
            f"{_DECODE_LORA_MODS} (plus text_encoder.* in prefill); these "
            f"adapter keys would be silently ignored at decode: "
            f"{unsupported[:6]}{'...' if len(unsupported) > 6 else ''} — "
            "merge them into the weights or retrain with the default "
            "target list")
    out: Dict[str, jax.Array] = {}
    for mod in _DECODE_LORA_MODS:
        if f"{prefix}.0.{mod}.lora_A" not in lora:
            continue
        for s in ("A", "B"):
            leaves = [jnp.asarray(lora[f"{prefix}.{i}.{mod}.lora_{s}"])
                      for i in range(nl)]
            leaves = [v if v.ndim == 3 else v[None] for v in leaves]
            out[f"{mod}.{s}"] = jnp.stack(leaves, axis=1)  # (V, nl, ...)
    qkv_mods = ("self_attn.linear_q", "self_attn.linear_k",
                "self_attn.linear_v")
    if all(f"{m}.A" in out for m in qkv_mods):
        # fuse q/k/v adapter factors into ONE pair of batched einsums per
        # token (the decode body is op-count-bound — PERF.md; 3x2 einsums
        # + zeros + concat per layer would undo the fused-wqkv economy)
        out["qkv.A"] = jnp.stack([out.pop(f"{m}.A") for m in qkv_mods],
                                 axis=2)  # (V, nl, 3, r, in)
        out["qkv.B"] = jnp.stack([out.pop(f"{m}.B") for m in qkv_mods],
                                 axis=2)  # (V, nl, 3, out, r)
    return out


def _lora_qkv_delta(x, la, D, scale):
    """Concatenated q/k/v adapter delta matching the fused wqkv matmul.
    x: (..., D); per-layer slices la[mod.A] (..., r, D) / la[mod.B]
    (..., D, r) with a leading batch axis iff x has one beyond the feature
    axis.  The fused ``qkv.A/B`` form (all three targeted — the default)
    computes the whole delta in two einsums."""
    if la is not None and "qkv.A" in la:
        a, b = la["qkv.A"], la["qkv.B"]
        if a.ndim == 4:  # (B, 3, r, in) — batch decode, per-row routing
            h = jnp.einsum("bi,bsri->bsr", x, a.astype(x.dtype))
            d = jnp.einsum("bsr,bsor->bso", h, b.astype(x.dtype)) * scale
            return d.reshape(x.shape[0], 3 * D)
        h = jnp.einsum("i,sri->sr", x, a.astype(x.dtype))  # (3, r)
        d = jnp.einsum("sr,sor->so", h, b.astype(x.dtype)) * scale
        return d.reshape(3 * D)
    parts = []
    for mod in ("self_attn.linear_q", "self_attn.linear_k",
                "self_attn.linear_v"):
        d = _lora_mm(x, la, mod, scale)
        parts.append(jnp.zeros(x.shape[:-1] + (D,), x.dtype) if d is None else d)
    return jnp.concatenate(parts, axis=-1)


def _lora_mm(x, la, mod, scale):
    """(x @ A^T) @ B^T * scale for one per-layer adapter slice, or None.
    Row-routed when the slices carry a batch axis (x (B, D), A (B, r, in))."""
    if la is None or f"{mod}.A" not in la:
        return None
    a, b = la[f"{mod}.A"], la[f"{mod}.B"]
    if a.ndim == 3:  # per-row (B, r, in) — batch decode
        h = jnp.einsum("b...i,bri->b...r", x, a.astype(x.dtype))
        return jnp.einsum("b...r,bor->b...o", h, b.astype(x.dtype)) * scale
    h = jnp.einsum("...i,ri->...r", x, a.astype(x.dtype))
    return jnp.einsum("...r,or->...o", h, b.astype(x.dtype)) * scale


def _ln_f32(x, w, b, eps):
    """Identical to layers.basic.layer_norm (fp32 stats + affine)."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(xf - m), axis=-1, keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(v + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def llm_decode(
    p: P,
    cfg: LLMConfig,
    rng: jax.Array,
    prefix_emb: jax.Array,  # (1, L0, D) packed [sos, spk, text, task, prompt_speech]
    prefix_len: int,
    min_len: jax.Array,  # scalar
    max_len: int,  # static decode capacity
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
    int8_weights: bool = False,
    stop_at: Optional[jax.Array] = None,
    state: Optional[DecodeState] = None,
    return_state: bool = False,
    lora: Optional[Params] = None,
    vid: Optional[jax.Array] = None,
    lora_scale: float = 1.0,
):
    """Greedy-loop AR decode with fixed-capacity KV cache (llm.py:164-228).

    ``lora``: serve UN-merged LoRA adapters (flat ``llm.*.lora_A/B`` dict,
    single voice or voice-stacked via ``lora.stack_voice_loras`` with
    ``vid`` selecting the voice).  Deltas are applied to the six targeted
    block matmuls inside the decode loop and, via Ctx, throughout prefill —
    multi-voice serving without merging (the reference merges per voice,
    one full model copy each; adapters are ~2 M params/voice instead).

    The whole function jits into one program per (prefix_len, max_len) bucket.

    ``int8_weights=True`` runs the per-token layer stack with int8
    weight-only quantization (per-output-channel scales, dequantized in the
    matmul).  bs=1 decode is weight-bandwidth-bound (PERF.md), so halving
    weight bytes buys ~1.7x tokens/s; prefill and the final logits head stay
    full precision.

    Streaming (the reference's producer-thread token feed, model.py:144-165):
    pass ``stop_at`` to pause the loop at a token boundary and
    ``return_state=True`` to get a resumable :class:`DecodeState`; resume by
    passing it back as ``state`` (prefill is skipped).  Token streams are
    identical to a single uninterrupted run.
    """
    ecfg = cfg.llm
    D = ecfg.output_size
    H = ecfg.attention_heads
    dk = ecfg.head_dim
    nl = ecfg.num_blocks
    L0 = prefix_emb.shape[1]
    S = L0 + max_len  # total KV capacity
    dt = prefix_emb.dtype
    eos = cfg.speech_token_size

    sp_llm = p.sub("llm")

    # ---- input embed (linear_legacy: Linear+LN+Dropout+ReLU, then xscale) ----
    embed_tokens = _token_embed_legacy(sp_llm, D, dt)

    # ---- hoisted positional keys: per layer (1, H, 2S-1, dk) ----
    table = rel_pos_table(S, D).astype(dt)
    pos_ks = []
    for i in range(nl):
        pk = dense(sp_llm.sub(f"encoders.{i}.self_attn"), "linear_pos", table)
        pos_ks.append(_split_heads(pk, H)[0])
    pos_ks = jnp.stack(pos_ks)  # (nl, H, 2S-1, dk)

    kv_buf = jnp.zeros((nl, 2, H, S, dk), dt)

    # stacked per-layer params, fused for the per-token step.  The decode
    # body is op-count-bound on this chip (PERF.md: ~6 us/fusion regardless
    # of size), so the layer stack runs as ONE lax.scan over a (nl, ...)
    # pytree with: QKV as a single concatenated matmul, K/V in one combined
    # cache (one dynamic_update_slice), and the Transformer-XL content/
    # position scores as one matmul over concatenated [k; pos_k] — all
    # algebraically identical to transformer_layer.
    import math as _math

    from ..layers.basic import ACT

    stacked = _stack_decode_layers(sp_llm, nl, int8_weights)
    act = ACT[ecfg.activation_type]
    eps_l = ecfg.layer_norm_eps
    inv_sqrt_dk = 1.0 / _math.sqrt(dk)
    _ln = _ln_f32

    # voice adapters: prefill consumes the stacked dict through Ctx (routed
    # by lora_vids in layers.basic); the decode scan gets per-layer slices
    # pre-gathered for this voice
    la_xs: Dict[str, jax.Array] = {}
    ctx0 = EVAL
    if lora is not None:
        from ..lora import ensure_voice_stacked

        lora_v = ensure_voice_stacked(lora)
        vid_ = jnp.asarray(0 if vid is None else vid, jnp.int32)
        lst = _stack_decode_loras(lora_v, nl)
        la_xs = {k_: v_[vid_] for k_, v_ in lst.items()}  # (nl, r/out, ...)
        ctx0 = Ctx(lora=lora_v, lora_scale=lora_scale, lora_vids=vid_[None])

    def run_layers(x, kvbuf, cache_index, attn_bias, pos_start):
        """x: (1, 1, D).  kvbuf: (nl, 2, H, S, dk).  attn_bias: (1, 1, S).
        pos_start: scalar offset into the (2S-1) positional-key table.

        The KV buffer rides the layer scan as CARRY and is updated in place
        (one dynamic_update_slice per layer).  Carrying it as scan xs/ys
        instead materializes full per-layer cache copies every token — the
        S-dependence probe (tools/probe_kvscan.py) measured 3.2x per-token
        cost at S=576 vs S=128 from exactly that.  The positional window is
        likewise sliced per layer here rather than pre-gathered (the old
        (nl, H, S, dk) copy was another full-table read per token)."""
        bias_row = attn_bias[0, 0].astype(jnp.float32)  # (S,)

        def body(carry, xs):
            h, kvb = carry
            ld, la, l = xs
            w = {k_: v_.astype(h.dtype) for k_, v_ in ld.items()
                 if v_.dtype != jnp.int8 and not k_.endswith("@scale")}
            hn = _ln(h, ld["norm1.weight"], ld["norm1.bias"], eps_l)
            qkv = _matmul_q(hn[0, 0], ld, "wqkv") + w["bqkv"]  # (3D,)
            if la:
                qkv = qkv + _lora_qkv_delta(hn[0, 0], la, D, lora_scale)
            q = qkv[:D].reshape(H, 1, dk)
            k = qkv[D:2 * D].reshape(H, dk)
            v = qkv[2 * D:].reshape(H, dk)
            kvb = jax.lax.dynamic_update_slice(
                kvb, jnp.stack([k, v])[None, :, :, None, :].astype(kvb.dtype),
                (l, 0, 0, cache_index, 0))
            kv_i = jax.lax.dynamic_slice(
                kvb, (l, 0, 0, 0, 0), (1, 2, H, S, dk))[0]
            kc, vc = kv_i[0], kv_i[1]  # (H, S, dk)
            pk_i = jax.lax.dynamic_slice(
                pos_ks, (l, 0, pos_start, 0), (1, H, S, dk))[0]
            q_cat = jnp.concatenate(
                [q + w["self_attn.pos_bias_u"][:, None, :],
                 q + w["self_attn.pos_bias_v"][:, None, :]], axis=-1)  # (H,1,2dk)
            k_cat = jnp.concatenate([kc.astype(h.dtype), pk_i.astype(h.dtype)],
                                    axis=-1)  # (H, S, 2dk)
            scores = jnp.einsum("htd,hsd->hts", q_cat, k_cat) * inv_sqrt_dk
            attn = jax.nn.softmax(
                scores.astype(jnp.float32) + bias_row, axis=-1).astype(h.dtype)
            o = jnp.einsum("hts,hsd->htd", attn, vc.astype(h.dtype))  # (H, 1, dk)
            o = o.transpose(1, 0, 2).reshape(D)
            op = _matmul_q(o, ld, "self_attn.linear_out.weight") \
                + w["self_attn.linear_out.bias"]
            d = _lora_mm(o, la, "self_attn.linear_out", lora_scale)
            if d is not None:
                op = op + d
            h = h + op[None, None]
            hn2 = _ln(h, ld["norm2.weight"], ld["norm2.bias"], eps_l)
            f = _matmul_q(hn2, ld, "feed_forward.w_1.weight") \
                + w["feed_forward.w_1.bias"]
            d = _lora_mm(hn2, la, "feed_forward.w_1", lora_scale)
            if d is not None:
                f = f + d
            f = act(f)
            f2 = _matmul_q(f, ld, "feed_forward.w_2.weight") \
                + w["feed_forward.w_2.bias"]
            d = _lora_mm(f, la, "feed_forward.w_2", lora_scale)
            if d is not None:
                f2 = f2 + d
            return (h + f2, kvb), None

        (x, kvbuf), _ = jax.lax.scan(
            body, (x, kvbuf), (stacked, la_xs, jnp.arange(nl)))
        x = layer_norm(sp_llm, "after_norm", x, eps=1e-5)
        return x, kvbuf

    def sample(rng_i, logits, step_i, tokens, ntok):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        # force continue on first token; mask EOS before min_len (exact
        # renormalized equivalent of the reference's rejection loop)
        mask_eos = (step_i == 0) | (step_i < min_len)
        logp = logp.at[eos].set(jnp.where(mask_eos, -jnp.inf, logp[eos]))
        return ras_sample(rng_i, logp, tokens, ntok, top_p, top_k, win_size, tau_r)

    if state is None:
        # ---- prefill: run the plain causal encoder over the L0 prefix and
        # write each layer's K/V into the fixed-capacity buffers ----
        x0 = embed_tokens(prefix_emb)
        pe0 = rel_pos_table(L0, D).astype(dt)
        causal0 = jnp.where(jnp.arange(L0)[:, None] >= jnp.arange(L0)[None, :],
                            0.0, M.NEG_BIAS)[None].astype(dt)
        h = x0
        for i in range(nl):
            # return_kv exposes the layer's own K/V so the cache seed shares
            # the norm1 + projection work with the forward pass (no 2x prefill)
            h, (ki, vi) = transformer_layer(
                sp_llm, f"encoders.{i}", ecfg, h, causal0, pe0, ctx0, return_kv=True)
            kv_buf = kv_buf.at[i, 0, :, :L0].set(ki[0].astype(dt))
            kv_buf = kv_buf.at[i, 1, :, :L0].set(vi[0].astype(dt))
        h = layer_norm(sp_llm, "after_norm", h, eps=1e-5)
        logits0 = dense(p, "llm_decoder", h[:, -1])[0]  # (V,)

        tokens = jnp.full((max_len,), -1, jnp.int32)
        k_s, rng = jax.random.split(rng)
        first = sample(k_s, logits0, jnp.asarray(0), tokens,
                       jnp.asarray(0)).astype(jnp.int32)
        tokens = tokens.at[0].set(first)
        state = DecodeState(i=jnp.asarray(1), tokens=tokens, last=first,
                            kv_buf=kv_buf, rng=rng, done=first == eos)

    stop = jnp.asarray(max_len) if stop_at is None else jnp.minimum(
        jnp.asarray(stop_at), max_len)

    def cond(state):
        i, tokens, last, kvb, rng, done = state
        return (~done) & (i < stop)

    def body(state):
        i, tokens, last, kvb, rng, done = state
        # the input is token i-1's embedding, producing logits for token i;
        # its K/V slot is L = L0 + i - 1
        L = L0 + i - 1
        x = embedding(p, "speech_embedding", last[None, None])  # (1, 1, D)
        x = embed_tokens(x)
        kpos = jnp.arange(S)[None, None, :]
        bias = jnp.where(kpos <= L, 0.0, M.NEG_BIAS).astype(dt)  # (1, 1, S)
        h, kvb = run_layers(x, kvb, L, bias, S - 1 - L)
        logits = dense(p, "llm_decoder", h[:, -1])[0]
        k_i, rng = jax.random.split(rng)
        tok = sample(k_i, logits, i, tokens, i).astype(jnp.int32)
        is_eos = tok == eos
        tokens = jnp.where(is_eos, tokens, tokens.at[i].set(tok))
        return DecodeState(i + 1, tokens, tok, kvb, rng, is_eos)

    out = jax.lax.while_loop(cond, body, state)
    result = DecodeResult(tokens=out.tokens, length=jnp.sum(out.tokens >= 0))
    if return_state:
        return result, out
    return result


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_llm_params(key: jax.Array, cfg: LLMConfig) -> Params:
    d: Params = {}
    kg = KeyGen(key)
    init_embedding(kg(), d, "text_embedding", cfg.text_token_size, cfg.text_encoder_input_size)
    init_encoder(kg, d, "text_encoder", cfg.text_encoder, conformer=True)
    init_linear(kg(), d, "text_encoder_affine_layer", cfg.text_encoder.output_size, cfg.llm_input_size)
    init_embedding(kg(), d, "llm_embedding", 2, cfg.llm_input_size)
    init_encoder(kg, d, "llm", cfg.llm, conformer=False)
    init_linear(kg(), d, "llm_decoder", cfg.llm_output_size, cfg.speech_token_size + 1)
    init_embedding(kg(), d, "speech_embedding", cfg.speech_token_size, cfg.llm_input_size)
    init_linear(kg(), d, "spk_embed_affine_layer", cfg.spk_embed_dim, cfg.llm_input_size)
    return d


class BatchDecodeResult(NamedTuple):
    tokens: jax.Array  # (B, max_len) int32, -1 padded
    lengths: jax.Array  # (B,) valid counts


class BatchDecodeState(NamedTuple):
    """Resumable lock-step state for segment-wise batched (streaming) decode.

    Cache columns are SLOT-LOCAL: slot ``b``'s prefix always occupies
    columns ``[0, L0)`` of its own batch row and its generated-token keys
    follow at ``[L0, L0 + lens_b)`` — exactly the solo :func:`llm_decode`
    layout vmapped over slots.  ``i`` only counts loop steps (segment
    scheduling); it never bounds cache placement, so a continuous-batching
    admission (:func:`llm_admit_slot`) needs no runway and never stalls."""
    i: jax.Array  # loop-step counter (segment scheduling only)
    tokens: jax.Array  # (B, max_len)
    last: jax.Array  # (B,) previous token ids
    kv_buf: jax.Array  # (nl, 2, B, H, S, dk)
    rngs: jax.Array  # (B, 2) per-sample streams
    done: jax.Array  # (B,) bool
    lens: jax.Array  # (B,) generated-token counts (slot-local steps)


def llm_decode_batch(
    p: P,
    cfg: LLMConfig,
    rng: jax.Array,
    prefix_emb: jax.Array,  # (B, L0, D) LEFT-padded prefixes
    prefix_valid: jax.Array,  # (B,) valid prefix lengths (right-aligned)
    min_len: jax.Array,  # (B,)
    max_len: int,
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
    int8_weights: bool = False,
    max_lens: Optional[jax.Array] = None,  # (B,) per-sample caps <= max_len
    stop_at: Optional[jax.Array] = None,  # scalar — pause the cohort here
    state: Optional[BatchDecodeState] = None,
    return_state: bool = False,
    attend_width: Optional[int] = None,  # static: read only this many cache cols
    lora: Optional[Params] = None,  # voice-stacked adapters (stack_voice_loras)
    vids: Optional[jax.Array] = None,  # (B,) per-row voice index into lora
    lora_scale: float = 1.0,
):
    """Batched AR decode for serving throughput.

    bs=1 decode is weight-bandwidth-bound (PERF.md): every token reads the
    whole LLM.  Batching B requests amortizes that read, so aggregate tok/s
    scales nearly with B.  Prefixes are LEFT-padded so every sample shares
    a common L0 (padding keys are masked out, which makes each sample's
    logits exactly those of an unpadded run); sample ``b``'s rng stream is
    ``fold_in(rng, b)``, so its tokens equal a ``llm_decode`` call with
    that key.

    Segment-wise streaming (batched llm_job cohorts): pass ``stop_at`` to
    pause the lock-step loop at a token boundary and ``return_state=True``
    for a resumable :class:`BatchDecodeState`; resume by passing it back as
    ``state`` (prefill is skipped).  Token streams are bit-identical to an
    uninterrupted run.

    Continuous batching (:mod:`cosy_tpu.infer.engine`): cache columns,
    positions, and per-token bookkeeping (RAS window, min/max-length, EOS
    masking, token columns) are all SLOT-LOCAL (``state.lens``), so every
    slot runs exactly the solo ``llm_decode`` program vmapped — a request
    admitted into a paused state (:func:`llm_admit_slot`) starts at its own
    column 0 regardless of how long its batchmates have been decoding.
    There is no shared-runway constraint and admission never waits for a
    cohort drain (the pre-r7 design kept one shared column counter, which
    deferred admissions whose cap exceeded ``max_len - i`` — measured TTFA
    collapse under load, PERF.md "continuous batching v2").
    """
    ecfg = cfg.llm
    D, H, dk, nl = (ecfg.output_size, ecfg.attention_heads, ecfg.head_dim,
                    ecfg.num_blocks)
    B, L0 = prefix_emb.shape[0], prefix_emb.shape[1]
    S = L0 + max_len
    dt = prefix_emb.dtype
    eos = cfg.speech_token_size
    sp_llm = p.sub("llm")
    # slot b's valid prefix keys occupy [start_b, L0) of its OWN cache row
    start = (L0 - prefix_valid.astype(jnp.int32))  # (B,) first valid key col
    # attend_width W: the decode step reads only cache columns [0, W) — EXACT
    # (not an approximation) as long as every key written during this call
    # lives below W, i.e. W >= L0 + max(lens) reached within the call.  The
    # cache is allocated at the full S, but per-token HBM traffic is
    # W-proportional; segmented serving picks a W rung per segment (one
    # program per rung) instead of streaming all S columns for every token.
    W = S if attend_width is None else max(L0 + 1, min(attend_width, S))

    embed_tokens = _token_embed_legacy(sp_llm, D, dt)

    table = rel_pos_table(S, D).astype(dt)
    pos_ks = jnp.stack([
        _split_heads(dense(sp_llm.sub(f"encoders.{i}.self_attn"), "linear_pos",
                           table), H)[0] for i in range(nl)])  # (nl, H, 2S-1, dk)

    import math as _math

    from ..layers.basic import ACT

    stacked = _stack_decode_layers(sp_llm, nl, int8_weights)
    act = ACT[ecfg.activation_type]
    eps_l = ecfg.layer_norm_eps
    inv_sqrt_dk = 1.0 / _math.sqrt(dk)
    _mm = _matmul_q
    _ln = _ln_f32

    # multi-voice adapters: prefill routes per row through Ctx.lora_vids;
    # the decode scan gets per-row pre-gathered slices (B rows gather their
    # own voice's (r, in)/(out, r) factors once, outside the token loop)
    la_xs: Dict[str, jax.Array] = {}
    ctx0 = EVAL
    if lora is not None:
        from ..lora import ensure_voice_stacked

        lora_v = ensure_voice_stacked(lora)
        vids_ = (jnp.zeros((B,), jnp.int32) if vids is None
                 else jnp.asarray(vids, jnp.int32))
        lst = _stack_decode_loras(lora_v, nl)
        # (V, nl, ...) -> gather rows -> (B, nl, ...) -> (nl, B, ...) scan xs
        la_xs = {k_: jnp.moveaxis(jnp.take(v_, vids_, axis=0), 0, 1)
                 for k_, v_ in lst.items()}
        ctx0 = Ctx(lora=lora_v, lora_scale=lora_scale, lora_vids=vids_)

    caps_ = (jnp.full((B,), max_len, jnp.int32) if max_lens is None
             else jnp.minimum(jnp.asarray(max_lens, jnp.int32), max_len))

    def sample_one(rng_i, logits, step_i, tokens_b, ntok, min_b):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        mask_eos = (step_i == 0) | (step_i < min_b)
        logp = logp.at[eos].set(jnp.where(mask_eos, -jnp.inf, logp[eos]))
        return ras_sample(rng_i, logp, tokens_b, ntok, top_p, top_k,
                          win_size, tau_r)

    sample_vec = jax.vmap(sample_one, in_axes=(0, 0, 0, 0, 0, 0))

    def run_layers(x, kvbuf, L_vec, attn_bias, pos_start):
        """x: (B, 1, D). kvbuf: (nl, 2, B, H, S, dk). attn_bias: (B, 1, 1, W).
        L_vec: (B,) per-slot key-write column.  pos_start: (B,) per-slot
        offset into the (2S-1) positional-key table (= S - 1 - L_b, the
        same formula the solo decode uses with its own L).

        The KV buffer rides the layer scan as CARRY and is updated in place;
        the positional window is sliced per layer (see the single-sample
        run_layers above — scan xs/ys carried full cache copies per token,
        3.2x per-token cost at S=576 vs S=128, tools/probe_kvscan.py).  Only
        cache columns [0, W) are read (attend_width).  Per-slot columns make
        the write a B-row scatter and the positional window a B-row gather
        instead of one dynamic slice — measured cost below 2% of the B=16
        step (the step is weight/cache-bandwidth-bound)."""
        bias_f = attn_bias.astype(jnp.float32)
        iota_b = jnp.arange(B)

        def body(carry, xs):
            hc, kvb = carry
            ld, la, l = xs
            w = {k_: v_.astype(hc.dtype) for k_, v_ in ld.items()
                 if v_.dtype != jnp.int8 and not k_.endswith("@scale")}
            hn = _ln(hc, ld["norm1.weight"], ld["norm1.bias"], eps_l)
            qkv = _mm(hn[:, 0], ld, "wqkv") + w["bqkv"]  # (B, 3D)
            if la:
                qkv = qkv + _lora_qkv_delta(hn[:, 0], la, D, lora_scale)
            q = qkv[:, :D].reshape(B, H, 1, dk)
            k = qkv[:, D:2 * D].reshape(B, H, dk)
            v = qkv[:, 2 * D:].reshape(B, H, dk)
            # per-slot column write: one scatter of B (2, H, dk) rows
            kvb = kvb.at[l, :, iota_b, :, L_vec, :].set(
                jnp.stack([k, v], axis=1).astype(kvb.dtype))
            kv_i = jax.lax.dynamic_slice(
                kvb, (l, 0, 0, 0, 0, 0), (1, 2, B, H, W, dk))[0]
            kc, vc = kv_i[0], kv_i[1]  # (B, H, W, dk)
            pk_i = jax.vmap(lambda ps: jax.lax.dynamic_slice(
                pos_ks, (l.astype(ps.dtype), jnp.zeros((), ps.dtype), ps,
                         jnp.zeros((), ps.dtype)), (1, H, W, dk))[0])(pos_start)
            q_u = q + w["self_attn.pos_bias_u"][None, :, None, :]
            q_v = q + w["self_attn.pos_bias_v"][None, :, None, :]
            scores = (jnp.einsum("bhtd,bhsd->bhts", q_u, kc.astype(hc.dtype))
                      + jnp.einsum("bhtd,bhsd->bhts", q_v, pk_i.astype(hc.dtype)))
            scores = scores * inv_sqrt_dk
            attn = jax.nn.softmax(scores.astype(jnp.float32) + bias_f,
                                  axis=-1).astype(hc.dtype)
            o = jnp.einsum("bhts,bhsd->bhtd", attn, vc.astype(hc.dtype))
            o = o.transpose(0, 2, 1, 3).reshape(B, D)
            op = _mm(o, ld, "self_attn.linear_out.weight") \
                + w["self_attn.linear_out.bias"]
            d = _lora_mm(o, la, "self_attn.linear_out", lora_scale)
            if d is not None:
                op = op + d
            hc = hc + op[:, None]
            hn2 = _ln(hc, ld["norm2.weight"], ld["norm2.bias"], eps_l)
            f = _mm(hn2, ld, "feed_forward.w_1.weight") \
                + w["feed_forward.w_1.bias"]
            d = _lora_mm(hn2, la, "feed_forward.w_1", lora_scale)
            if d is not None:
                f = f + d
            f = act(f)
            f2 = _mm(f, ld, "feed_forward.w_2.weight") + w["feed_forward.w_2.bias"]
            d = _lora_mm(f, la, "feed_forward.w_2", lora_scale)
            if d is not None:
                f2 = f2 + d
            return (hc + f2, kvb), None

        (x, kvbuf), _ = jax.lax.scan(
            body, (x, kvbuf), (stacked, la_xs, jnp.arange(nl)))
        x = layer_norm(sp_llm, "after_norm", x, eps=1e-5)
        return x, kvbuf

    split2 = jax.vmap(jax.random.split)
    if state is None:
        # ---- prefill (padded queries compute garbage but their keys are
        # never attended; outputs read only at the right-aligned last
        # position) ----
        x0 = embed_tokens(prefix_emb)
        pe0 = rel_pos_table(L0, D).astype(dt)
        kq = jnp.arange(L0)
        vis = (kq[None, None, :] <= kq[None, :, None]) & \
              (kq[None, None, :] >= start[:, None, None])  # (B, L0, L0)
        bias0 = jnp.where(vis, 0.0, M.NEG_BIAS).astype(dt)
        kv_buf = jnp.zeros((nl, 2, B, H, S, dk), dt)
        h = x0
        for i in range(nl):
            h, (ki, vi) = transformer_layer(
                sp_llm, f"encoders.{i}", ecfg, h, bias0, pe0, ctx0, return_kv=True)
            kv_buf = kv_buf.at[i, 0, :, :, :L0].set(ki.astype(dt))
            kv_buf = kv_buf.at[i, 1, :, :, :L0].set(vi.astype(dt))
        h = layer_norm(sp_llm, "after_norm", h, eps=1e-5)
        logits0 = dense(p, "llm_decoder", h[:, -1])  # (B, V)

        tokens = jnp.full((B, max_len), -1, jnp.int32)
        rngs = jax.vmap(lambda b: jax.random.fold_in(rng, b))(jnp.arange(B))
        ks = split2(rngs)
        k_s, rngs = ks[:, 0], ks[:, 1]
        zeros_b = jnp.zeros((B,), jnp.int32)
        first = sample_vec(k_s, logits0, zeros_b, tokens,
                           zeros_b, min_len).astype(jnp.int32)
        # EOS is masked at step 0 (as in llm_decode), so the first token is
        # always a real speech token
        tokens = tokens.at[:, 0].set(first)
        state = BatchDecodeState(i=jnp.asarray(1), tokens=tokens,
                                 last=jnp.maximum(first, 0), kv_buf=kv_buf,
                                 rngs=rngs, done=caps_ <= 1,
                                 lens=jnp.ones((B,), jnp.int32))

    caps = caps_
    # stop bounds LOOP STEPS (segment scheduling), not cache placement —
    # per-slot columns are bounded by caps <= max_len, so i may exceed
    # max_len across a long-lived engine state
    stop = jnp.asarray(max_len) if stop_at is None else jnp.asarray(stop_at)

    def cond(st):
        return jnp.any(~st.done) & (st.i < stop)

    def body(st):
        i, tokens, last, kvb, rngs, done, lens = st
        L_vec = L0 + lens - 1  # (B,) this step's key column, slot-local
        x = embedding(p, "speech_embedding", jnp.maximum(last, 0)[:, None])
        x = embed_tokens(x)
        kpos = jnp.arange(W)[None, :]
        bias = jnp.where((kpos <= L_vec[:, None]) & (kpos >= start[:, None]),
                         0.0, M.NEG_BIAS).astype(dt)[:, None, None, :]  # (B,1,1,W)
        h, kvb = run_layers(x, kvb, L_vec, bias, S - 1 - L_vec)
        logits = dense(p, "llm_decoder", h[:, -1])  # (B, V)
        ks = split2(rngs)
        k_i, rngs = ks[:, 0], ks[:, 1]
        li = lens  # (B,) per-slot LOCAL step
        tok = sample_vec(k_i, logits, li, tokens, li, min_len).astype(jnp.int32)
        is_eos = tok == eos
        freeze = done | is_eos
        # slot b's token for local step li_b lives at column li_b (token
        # columns are LOCAL, so lengths/RAS windows match a solo run); a
        # frozen slot's column is simply not written.  A frozen slot keeps
        # re-writing its own key column with a constant value — harmless,
        # since only slot b's queries ever read slot b's cache row and its
        # outputs are discarded once frozen.
        write = (~freeze)[:, None] & (
            jnp.arange(max_len)[None, :] == li[:, None])
        tokens = jnp.where(write, tok[:, None], tokens)
        last = jnp.where(freeze, last, tok)
        # per-sample cap: sample b stops after caps[b] tokens even while
        # longer batchmates continue
        done = done | is_eos | (li + 1 >= caps)
        lens = lens + jnp.where(freeze, 0, 1)
        return BatchDecodeState(i + 1, tokens, last, kvb, rngs, done, lens)

    out = jax.lax.while_loop(cond, body, state)
    result = BatchDecodeResult(tokens=out.tokens,
                               lengths=jnp.sum(out.tokens >= 0, axis=1))
    if return_state:
        return result, out
    return result


def llm_admit_slot(
    p: P,
    cfg: LLMConfig,
    state: BatchDecodeState,
    prefix_emb: jax.Array,  # (1, L0, D) LEFT-padded to the cohort's L0
    prefix_valid: jax.Array,  # scalar valid prefix length
    rng_req: jax.Array,  # the request's OWN decode key
    slot: jax.Array,  # scalar slot index to (re)occupy
    cap: jax.Array,  # scalar per-request token cap
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
    lora: Optional[Params] = None,  # voice-stacked adapters (stack_voice_loras)
    vid: Optional[jax.Array] = None,  # scalar voice index for this request
    lora_scale: float = 1.0,
):
    """Admit one request into a paused :class:`BatchDecodeState` — the
    continuous-batching join step (vLLM-style serving, TPU static shapes).

    Prefills the newcomer's prefix (B=1), samples its first token with ITS
    OWN rng stream (``split(rng_req)`` — the same stream a solo
    :func:`llm_decode` with ``rng_req`` uses, so the continued batch decode
    is bit-identical to that solo run), and splices kv/tokens/rng/done into
    slot ``slot``.  Cache columns are slot-local (:class:`BatchDecodeState`),
    so the prefix keys go to columns ``[0, L0)`` of the slot's own cache row
    and ``lens[slot]`` resets to 1 — admission is runway-free regardless of
    how far the running batchmates have decoded.
    """
    ecfg = cfg.llm
    D, H, nl = ecfg.output_size, ecfg.attention_heads, ecfg.num_blocks
    dk = ecfg.head_dim
    L0 = prefix_emb.shape[1]
    max_len = state.tokens.shape[1]
    dt = prefix_emb.dtype
    eos = cfg.speech_token_size
    sp_llm = p.sub("llm")

    embed_tokens = _token_embed_legacy(sp_llm, D, dt)

    # ---- B=1 prefill (same masked left-padded math as the cohort prefill) --
    x0 = embed_tokens(prefix_emb)
    pe0 = rel_pos_table(L0, D).astype(dt)
    start1 = L0 - prefix_valid.astype(jnp.int32)
    kq = jnp.arange(L0)
    vis = (kq[None, None, :] <= kq[None, :, None]) & (kq[None, None, :] >= start1)
    bias0 = jnp.where(vis, 0.0, M.NEG_BIAS).astype(dt)
    ctx0 = EVAL
    if lora is not None:
        from ..lora import ensure_voice_stacked

        vid_ = jnp.asarray(0 if vid is None else vid, jnp.int32)
        ctx0 = Ctx(lora=ensure_voice_stacked(lora), lora_scale=lora_scale,
                   lora_vids=vid_[None])
    newkv = jnp.zeros((nl, 2, 1, H, L0, dk), dt)
    h = x0
    for i in range(nl):
        h, (ki, vi) = transformer_layer(
            sp_llm, f"encoders.{i}", ecfg, h, bias0, pe0, ctx0, return_kv=True)
        newkv = newkv.at[i, 0].set(ki.astype(dt))
        newkv = newkv.at[i, 1].set(vi.astype(dt))
    h = layer_norm(sp_llm, "after_norm", h, eps=1e-5)
    logits0 = dense(p, "llm_decoder", h[:, -1])[0]  # (V,)

    # ---- first token: the solo llm_decode prefill sampling, per-request key
    k_s, k_rest = jax.random.split(rng_req)
    row = jnp.full((max_len,), -1, jnp.int32)
    logp = jax.nn.log_softmax(logits0.astype(jnp.float32))
    logp = logp.at[eos].set(-jnp.inf)  # EOS masked at step 0
    first = ras_sample(k_s, logp, row, jnp.asarray(0), top_p, top_k,
                       win_size, tau_r).astype(jnp.int32)
    row = row.at[0].set(first)

    # ---- splice into the cohort state (state.i untouched) ----
    slot = jnp.asarray(slot, jnp.int32)
    z = jnp.int32(0)
    kv_buf = jax.lax.dynamic_update_slice(
        state.kv_buf, newkv.astype(state.kv_buf.dtype),
        (z, z, slot, z, z, z))
    tokens = jax.lax.dynamic_update_slice(state.tokens, row[None], (slot, z))
    last = state.last.at[slot].set(jnp.maximum(first, 0))
    rngs = state.rngs.at[slot].set(k_rest)
    done = state.done.at[slot].set(jnp.asarray(cap) <= 1)
    lens = state.lens.at[slot].set(1)
    return BatchDecodeState(state.i, tokens, last, kv_buf, rngs, done, lens)
