"""CosyVoice2 flow: CausalMaskedDiffWithXvec + CausalConditionalCFM.

Reference behavior: cosyvoice/flow/flow.py:151-281 and
flow_matching.py:196-227.  The encoder is the UpsampleConformerEncoder
(token rate -> 2x mel rate), the estimator is the causal U-Net, and inference
noise comes from a fixed seeded buffer for streaming determinism (the
reference seeds torch RNG with 0 and draws randn(1, 80, 15000);
``fixed_noise`` reproduces that buffer bit-exactly via torch when available).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import EncoderConfig, EstimatorConfig, CFMConfig
from ..ctx import Ctx, EVAL
from ..params import P, Params, KeyGen, init_linear, init_embedding
from ..ops import masks as M
from ..layers.basic import dense, embedding
from ..layers.unet import conditional_decoder, init_conditional_decoder
from ..layers.upsample_encoder import upsample_encoder_forward, init_upsample_encoder
from .flow import PI, _l2_normalize


@dataclass(frozen=True)
class Flow2Config:
    """CausalMaskedDiffWithXvec topology (flow.py:151-188 + CosyVoice2 yaml)."""

    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    vocab_size: int = 6561
    input_frame_rate: int = 25
    token_mel_ratio: int = 2
    pre_lookahead_len: int = 3
    encoder: EncoderConfig = field(
        default_factory=lambda: EncoderConfig(
            input_size=512, output_size=512, attention_heads=8, linear_units=2048,
            num_blocks=6, attention_dropout_rate=0.1, macaron_style=False,
            use_cnn_module=False, static_chunk_size=25,
        )
    )
    num_up_blocks: int = 4
    estimator: EstimatorConfig = field(
        default_factory=lambda: EstimatorConfig(
            in_channels=320, out_channels=80, channels=(256, 256),
            attention_head_dim=64, n_blocks=4, num_mid_blocks=12, num_heads=8,
            act_fn="gelu",
        )
    )
    cfm: CFMConfig = field(default_factory=CFMConfig)
    decoder_static_chunk_size: int = 50  # mel frames (2 x 25-token chunks)


@functools.lru_cache(maxsize=1)
def fixed_noise(n_mels: int = 80, length: int = 50 * 300) -> np.ndarray:
    """The reference's deterministic streaming noise buffer
    (flow_matching.py:198-199: torch.manual_seed(0); randn(1, 80, 15000))."""
    try:
        import torch

        g = torch.Generator().manual_seed(0)
        torch.manual_seed(0)
        return torch.randn(1, n_mels, length).numpy()
    except Exception:  # noqa: BLE001
        return np.random.default_rng(0).standard_normal((1, n_mels, length)).astype(np.float32)


def flow2_encode(p: P, cfg: Flow2Config, token, token_len, ctx: Ctx,
                 streaming: bool = False, context=None,
                 mask_pads_exact: bool = False):
    T_tok = token.shape[1]
    tok_mask = M.make_non_pad_mask(token_len, T_tok)[:, :, None]
    emb = embedding(p, "input_embedding", token, clamp_min=0)
    emb = emb * tok_mask.astype(emb.dtype)
    ctx_emb = None
    if context is not None and context.shape[1] != 0:
        ctx_emb = embedding(p, "input_embedding", context, clamp_min=0)
    h, _ = upsample_encoder_forward(
        p.sub("encoder"), cfg.encoder, emb, token_len, ctx,
        streaming=streaming, context=ctx_emb,
        num_up_blocks=cfg.num_up_blocks, up_stride=cfg.token_mel_ratio,
        pre_lookahead_len=cfg.pre_lookahead_len,
        token_chunk_size=cfg.encoder.static_chunk_size,
        mask_pads_exact=mask_pads_exact,
    )
    return dense(p, "encoder_proj", h, ctx)


def flow2_forward_train(
    p: P,
    cfg: Flow2Config,
    rng: jax.Array,
    batch: Dict[str, jax.Array],
    ctx: Ctx,
    streaming: bool = False,
) -> jax.Array:
    """Unified streaming/non-streaming training (flow.py:189-233): the host
    draws the 50%% streaming flag per step (two cached programs), simple
    50%%-drop / U(0, 0.3)-length prompt conds, plain masked MSE CFM loss
    (no mel normalization in CosyVoice2)."""
    token = batch["speech_token"]
    token_len = batch["speech_token_len"].astype(jnp.int32)
    feat = batch["speech_feat"]  # (B, T, 80) — NOT normalized
    feat_len = batch["speech_feat_len"].astype(jnp.int32)
    spk = batch["embedding"]
    B, T, _ = feat.shape

    k_cond, k_len, k_loss = jax.random.split(rng, 3)

    spk_p = dense(p, "spk_embed_affine_layer", _l2_normalize(spk, axis=1), ctx)
    h = flow2_encode(p, cfg, token, token_len, ctx, streaming=streaming)
    h_len = token_len * cfg.token_mel_ratio
    # crop/pad mu to the feat grid
    if h.shape[1] < T:
        h = jnp.pad(h, ((0, 0), (0, T - h.shape[1]), (0, 0)))
    else:
        h = h[:, :T]

    # conds: 50% none, else prompt of U(0, 0.3*feat_len) frames (flow.py:216-221)
    drop = jax.random.bernoulli(k_cond, 0.5, (B,))
    plen = (jax.random.uniform(k_len, (B,)) * 0.3 * feat_len).astype(jnp.int32)
    plen = jnp.where(drop, 0, plen)
    idx = jnp.arange(T)[None, :]
    conds = jnp.where((idx < plen[:, None])[:, :, None], feat, 0.0).transpose(0, 2, 1)

    mask = M.make_non_pad_mask(h_len, T)[:, None, :].astype(h.dtype)

    # CFM loss (flow_matching.py:154-193: plain masked MSE, no prompt masking)
    x1 = feat.transpose(0, 2, 1)
    kt, kz, kcfg = jax.random.split(k_loss, 3)
    t = jax.random.uniform(kt, (B, 1, 1), x1.dtype)
    if cfg.cfm.t_scheduler == "cosine":
        t = 1.0 - jnp.cos(t * 0.5 * PI)
    z = jax.random.normal(kz, x1.shape, x1.dtype)
    sigma = cfg.cfm.sigma_min
    y = (1.0 - (1.0 - sigma) * t) * z + t * x1
    u = x1 - (1.0 - sigma) * z
    mu = h.transpose(0, 2, 1)
    if cfg.cfm.training_cfg_rate > 0:
        keep = (jax.random.uniform(kcfg, (B,)) > cfg.cfm.training_cfg_rate).astype(x1.dtype)
        mu = mu * keep[:, None, None]
        spk_p = spk_p * keep[:, None]
        conds = conds * keep[:, None, None]
    # sequence parallelism: no-op outside the trainer's sequence_sharding
    # context (parallel/sp.py; same annotation as the v1 flow loss)
    from ..parallel.sp import shard_seq

    y, mu, conds, mask = (shard_seq(a, 2) for a in (y, mu, conds, mask))
    pred = conditional_decoder(
        p.sub("decoder.estimator"), cfg.estimator, y, mask, mu, t[:, 0, 0], spk_p, conds,
        ctx, causal=True, streaming=streaming,
        static_chunk_size=cfg.decoder_static_chunk_size,
    )
    return jnp.sum(jnp.square((pred - u) * mask)) / (jnp.sum(mask) * u.shape[1])


def flow2_inference(
    p: P,
    cfg: Flow2Config,
    token: jax.Array,  # (1, T_tok)
    prompt_token: jax.Array,  # (1, T_ptok)
    prompt_feat: jax.Array,  # (1, T_pmel, 80)
    spk_embedding: jax.Array,  # (1, 192)
    streaming: bool = False,
    finalize: bool = True,
    n_timesteps: int = 10,
    token_valid: Optional[jax.Array] = None,  # traced: true token count
    sampler: str = "euler",  # "meanflow": few-step distilled u-field
) -> jax.Array:
    """Chunked/streaming inference (flow.py:235-281).  Returns (1, 80, T_out)
    where T_out = token_mel_ratio * target token count (minus lookahead when
    finalize=False).

    ``token_valid`` (traced, finalize + prompt-free only): the length-masked
    serving bucket — ``token`` is padded to a static bucket and ONE compiled
    program serves every true length in it (see flow.flow_inference).  The
    first ``token_valid * token_mel_ratio`` mel frames are BIT-exact vs the
    unpadded program: the causal estimator's convs cannot leak pads, the
    attention key-masks them, LayerNorms are per-position, and the noise is
    the fixed seeded buffer (same prefix at every length)."""
    ctx = EVAL
    spk = dense(p, "spk_embed_affine_layer", _l2_normalize(spk_embedding, axis=1), ctx)

    full = jnp.concatenate([prompt_token, token], axis=1)
    T_all = full.shape[1]
    if token_valid is not None:
        assert finalize and prompt_token.shape[1] == 0 \
            and prompt_feat.shape[1] == 0, \
            "length-masked bucket path is finalize-only and prompt-free"
    if finalize:
        token_in, context = full, None
        n_in = T_all
    else:
        token_in, context = full[:, : -cfg.pre_lookahead_len], full[:, -cfg.pre_lookahead_len:]
        n_in = T_all - cfg.pre_lookahead_len
    token_len = (jnp.asarray([n_in], jnp.int32) if token_valid is None
                 else jnp.reshape(token_valid, (1,)).astype(jnp.int32))

    h = flow2_encode(p, cfg, token_in, token_len, ctx, streaming=streaming,
                     context=context, mask_pads_exact=token_valid is not None)
    mel_len1 = prompt_feat.shape[1]
    T = h.shape[1]
    mel_len2 = T - mel_len1
    h = h  # encoder_proj applied inside flow2_encode

    conds = jnp.zeros((1, T, cfg.output_size), h.dtype)
    if mel_len1 > 0:
        conds = conds.at[:, :mel_len1].set(prompt_feat)
    conds = conds.transpose(0, 2, 1)

    # even T (token_mel_ratio=2 guarantees it when mel_len1 is even) takes the
    # mask-free dense fast path (see unet.py _mul_mask)
    T_pad = T + (T % 2)
    if token_valid is not None:
        mel_valid = token_valid * cfg.token_mel_ratio
        mask = (jnp.arange(T_pad)[None, None, :] < mel_valid).astype(h.dtype)
    else:
        mask = None if T_pad == T else \
            jnp.zeros((1, 1, T_pad), h.dtype).at[:, :, :T].set(1.0)
    mu = jnp.pad(h.transpose(0, 2, 1), ((0, 0), (0, 0), (0, T_pad - T)))
    conds = jnp.pad(conds, ((0, 0), (0, 0), (0, T_pad - T)))

    noise = jnp.asarray(fixed_noise(cfg.output_size)[:, :, :T_pad], h.dtype)

    if sampler == "meanflow":
        # few-step distilled average-velocity solve (train/distill.py):
        # guidance folded into the student, no cond/uncond batch doubling
        t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)

        def mstep(x, ts_pair):
            t, s_t = ts_pair
            u = conditional_decoder(
                p.sub("decoder.estimator"), cfg.estimator, x, mask, mu,
                jnp.full((1,), t, x.dtype), spk, conds, ctx, causal=True,
                streaming=streaming,
                static_chunk_size=cfg.decoder_static_chunk_size,
                s=jnp.full((1,), s_t, x.dtype))
            return (x + (s_t - t) * u).astype(x.dtype), None

        x, _ = jax.lax.scan(mstep, noise, (t_span[:-1], t_span[1:]))
        out = x[:, :, mel_len1:T].astype(jnp.float32)
        if token_valid is not None:
            out = out * (jnp.arange(out.shape[2])[None, None, :] < mel_valid)
        return out

    # Euler solve with CFG, causal estimator
    r = cfg.cfm.inference_cfg_rate
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    if cfg.cfm.t_scheduler == "cosine":
        t_span = 1.0 - jnp.cos(t_span * 0.5 * PI)
    ts, dts = t_span[:-1], t_span[1:] - t_span[:-1]

    mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spk2 = jnp.concatenate([spk, jnp.zeros_like(spk)], axis=0)
    cond2 = jnp.concatenate([conds, jnp.zeros_like(conds)], axis=0)

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2,), t, x.dtype)
        dphi = conditional_decoder(
            p.sub("decoder.estimator"), cfg.estimator, x2, mask2, mu2, t2, spk2, cond2,
            ctx, causal=True, streaming=streaming,
            static_chunk_size=cfg.decoder_static_chunk_size,
        )
        d = (1.0 + r) * dphi[:1] - r * dphi[1:]
        return (x + dt * d).astype(x.dtype), None

    x, _ = jax.lax.scan(step, noise, (ts, dts))
    out = x[:, :, mel_len1:T].astype(jnp.float32)
    if token_valid is not None:
        # pad region still carries the fixed noise (the solve only writes
        # masked velocity); downstream masked HiFT requires exact zeros
        out = out * (jnp.arange(out.shape[2])[None, None, :] < mel_valid)
    return out


def init_flow2_params(key: jax.Array, cfg: Flow2Config) -> Params:
    d: Params = {}
    kg = KeyGen(key)
    init_embedding(kg(), d, "input_embedding", cfg.vocab_size, cfg.input_size)
    init_linear(kg(), d, "spk_embed_affine_layer", cfg.spk_embed_dim, cfg.output_size)
    init_upsample_encoder(kg, d, "encoder", cfg.encoder,
                          num_up_blocks=cfg.num_up_blocks,
                          pre_lookahead_len=cfg.pre_lookahead_len,
                          up_stride=cfg.token_mel_ratio)
    init_linear(kg(), d, "encoder_proj", cfg.encoder.output_size, cfg.output_size)
    init_conditional_decoder(kg, d, "decoder.estimator", cfg.estimator, causal=True)
    return d
