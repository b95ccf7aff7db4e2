"""Conditional flow-matching mel decoder (MaskedDiffWithXvec + ConditionalCFM).

Reference behavior: flow_model.py (self-contained finetune copy) and
cosyvoice/flow/{flow,flow_matching}.py.  TPU-first re-design:

- the six anti-semantic-leakage strategies (reference: flow_model.py:309-385)
  are vectorized over the batch with JAX PRNG draws instead of per-sample
  Python ``random`` calls — distributionally equivalent, one traced program;
- the Euler ODE solve is a ``lax.scan`` over a precomputed (t, dt) schedule
  with the classifier-free-guidance pair batched (2B) exactly like the
  reference's x_in doubling (flow_model.py:94-125);
- all shapes static; mel time axis padded to a multiple of 2.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..config import AntiLeakageConfig, FlowConfig, NoPromptConfig
from ..ctx import Ctx, EVAL
from ..params import P, Params, KeyGen, init_linear, init_norm, init_conv1d, init_embedding
from ..ops import masks as M
from ..layers.basic import dense, embedding, conv1d, group_norm, mish
from ..layers.conformer import encoder_forward, init_encoder
from ..layers.unet import conditional_decoder, init_conditional_decoder

PI = 3.14159265359  # reference truncation (flow_model.py:90)


# ---------------------------------------------------------------------------
# Interpolation (torch F.interpolate mode='linear', align_corners=False)
# ---------------------------------------------------------------------------


def interpolate_linear(x: jax.Array, out_len: int) -> jax.Array:
    """(B, C, T) -> (B, C, out_len), half-pixel linear interpolation.

    Bit-matches torch.nn.functional.interpolate(mode='linear') which the
    reference uses in the length regulator (modules.py:817-837).
    """
    T = x.shape[-1]
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * (T / out_len) - 0.5
    pos = jnp.clip(pos, 0.0, T - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    w = (pos - lo).astype(x.dtype)
    return x[..., lo] * (1.0 - w) + x[..., hi] * w


def interpolate_linear_valid(
    x: jax.Array,  # (B, C, T) with only x[..., :in_valid] meaningful
    out_len: int,
    in_valid: jax.Array,  # traced scalar <= T
    out_valid: jax.Array,  # traced scalar <= out_len
) -> jax.Array:
    """Length-masked :func:`interpolate_linear`: interpolates the first
    ``in_valid`` input frames onto the first ``out_valid`` output frames of a
    static (B, C, out_len) buffer; frames beyond ``out_valid`` are zero.

    The valid region matches ``interpolate_linear(x[..., :in_valid],
    out_valid)`` to f32 rounding (the scale is computed in one division
    either way) — this is what makes ONE compiled serving program exact for
    every length in the bucket (see flow_inference token_valid)."""
    iv = in_valid.astype(jnp.float32)
    ov = jnp.maximum(out_valid.astype(jnp.float32), 1.0)
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * (iv / ov) - 0.5
    pos = jnp.clip(pos, 0.0, iv - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_valid.astype(jnp.int32) - 1)
    w = (pos - lo).astype(x.dtype)
    out = x[..., lo] * (1.0 - w) + x[..., hi] * w
    mask = (jnp.arange(out_len) < out_valid).astype(x.dtype)
    return out * mask


# ---------------------------------------------------------------------------
# InterpolateRegulator (reference: modules.py:800-837)
# ---------------------------------------------------------------------------


def regulator_stack(p: P, x: jax.Array, stages: int, ctx: Ctx,
                    frames_valid: Optional[jax.Array] = None) -> jax.Array:
    """Conv3+GroupNorm(1)+Mish x stages, then 1x1 conv.  x: (B, C, T).

    ``frames_valid`` (traced (B,) or scalar): length-masked exact variant for
    bucket-padded inputs — pad frames are re-zeroed after every conv and the
    GroupNorm statistics run over the valid frames only, so the valid region
    equals the unpadded computation (serving buckets, see flow_inference
    token_valid)."""
    mask = None
    if frames_valid is not None:
        T = x.shape[-1]
        mask = (jnp.arange(T)[None, None, :]
                < jnp.reshape(frames_valid, (-1, 1, 1))).astype(x.dtype)
        x = x * mask
    for s in range(stages):
        x = conv1d(p, f"model.{3 * s}", x, padding=1, ctx=ctx)
        if mask is not None:
            x = x * mask
        x = group_norm(p, f"model.{3 * s + 1}", x, num_groups=1,
                       frames_valid=frames_valid)
        x = mish(x)
        if mask is not None:
            x = x * mask
    out = conv1d(p, f"model.{3 * stages}", x, ctx=ctx)
    return out if mask is None else out * mask


def length_regulator(
    p: P, x: jax.Array, ylens: jax.Array, out_len: int, stages: int, ctx: Ctx
) -> jax.Array:
    """(B, T_tok, C) -> (B, out_len, C) masked by ylens (modules.py:817-821)."""
    mask = M.make_non_pad_mask(ylens, out_len)[:, :, None].astype(x.dtype)
    h = interpolate_linear(x.transpose(0, 2, 1), out_len)
    out = regulator_stack(p, h, stages, ctx).transpose(0, 2, 1)
    return out * mask


def length_regulator_inference(
    p: P,
    x1: jax.Array,  # (1, T_prompt_tok, C) prompt tokens' encodings (may be len 0)
    x2: jax.Array,  # (1, T_tok, C) target tokens' encodings
    mel_len1: int,
    mel_len2: int,
    stages: int,
    input_frame_rate: int = 50,
) -> jax.Array:
    """3-segment seam-preserving interpolation (reference: modules.py:823-837)."""
    ctx = EVAL
    if x2.shape[1] > 40:
        edge = int(20 / input_frame_rate * 22050 / 256)
        h_head = interpolate_linear(x2[:, :20].transpose(0, 2, 1), edge)
        h_mid = interpolate_linear(x2[:, 20:-20].transpose(0, 2, 1), mel_len2 - 2 * edge)
        h_tail = interpolate_linear(x2[:, -20:].transpose(0, 2, 1), edge)
        h2 = jnp.concatenate([h_head, h_mid, h_tail], axis=2)
    else:
        h2 = interpolate_linear(x2.transpose(0, 2, 1), mel_len2)
    if x1.shape[1] != 0:
        h1 = interpolate_linear(x1.transpose(0, 2, 1), mel_len1)
        h = jnp.concatenate([h1, h2], axis=2)
    else:
        h = h2
    return regulator_stack(p, h, stages, ctx).transpose(0, 2, 1)


def length_regulator_inference_valid(
    p: P,
    x2: jax.Array,  # (1, T_tok, C) target tokens' encodings, bucket-padded
    tok_valid: jax.Array,  # traced scalar: true token count <= T_tok
    mel_len2: int,  # static mel bucket length
    mel_valid: jax.Array,  # traced scalar: true mel frames <= mel_len2
    stages: int,
    input_frame_rate: int = 50,
) -> jax.Array:
    """Length-masked :func:`length_regulator_inference` (prompt-free): one
    compiled program serves every (tok_valid, mel_valid) in the bucket; the
    valid mel region equals the unpadded program's output and pad frames are
    zero.  The reference's >40-token 3-segment seam split becomes a traced
    select between both formulations (modules.py:823-837)."""
    ctx = EVAL
    xt = x2.transpose(0, 2, 1)  # (1, C, T_tok)
    T_tok = xt.shape[-1]
    edge = int(20 / input_frame_rate * 22050 / 256)

    # path B: plain interpolation (tok_valid <= 40)
    buf_b = interpolate_linear_valid(xt, mel_len2, tok_valid, mel_valid)

    if T_tok <= 40:  # bucket too small for the 3-segment split — B only
        h = buf_b
    else:
        # path A: 3-segment seam-preserving split (tok_valid > 40)
        h_head = interpolate_linear(xt[:, :, :20], edge)  # static head
        h_mid = interpolate_linear_valid(
            xt[:, :, 20:], mel_len2 - 2 * edge, tok_valid - 40, mel_valid - 2 * edge)
        tail_tok = jax.lax.dynamic_slice_in_dim(
            xt, jnp.maximum(tok_valid - 20, 0), 20, axis=2)
        h_tail = interpolate_linear(tail_tok, edge)
        buf_a = jnp.zeros((xt.shape[0], xt.shape[1], mel_len2), xt.dtype)
        buf_a = buf_a.at[:, :, :edge].set(h_head)
        buf_a = jax.lax.dynamic_update_slice_in_dim(
            buf_a, h_mid[:, :, : mel_len2 - 2 * edge], edge, axis=2)
        buf_a = jax.lax.dynamic_update_slice_in_dim(
            buf_a, h_tail, jnp.maximum(mel_valid - edge, 0), axis=2)
        h = jnp.where(tok_valid > 40, buf_a, buf_b)
    mask = (jnp.arange(mel_len2)[None, None, :] < mel_valid).astype(h.dtype)
    h = h * mask
    return regulator_stack(p, h, stages, ctx,
                           frames_valid=mel_valid).transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# ConditionalCFM
# ---------------------------------------------------------------------------


def cfm_t_span(n_timesteps: int, scheduler: str = "cosine") -> jax.Array:
    t = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    if scheduler == "cosine":
        t = 1.0 - jnp.cos(t * 0.5 * PI)
    return t


def cfm_solve_euler(
    p: P,
    cfg: FlowConfig,
    z: jax.Array,  # (B, 80, T) initial noise
    mask,  # (B, 1, T), or None == all-valid (dense fast path, see unet.py)
    mu: jax.Array,  # (B, 80, T)
    spks: jax.Array,  # (B, 80)
    cond: jax.Array,  # (B, 80, T)
    n_timesteps: int,
    ctx: Ctx = EVAL,
    frames_valid: Optional[jax.Array] = None,  # traced (B,) or scalar
) -> jax.Array:
    """Fixed-step Euler ODE solve with CFG batching (flow_model.py:94-125).

    ``frames_valid``: length-masked exact estimator statistics for
    bucket-padded serving programs (see conditional_decoder)."""
    B = z.shape[0]
    r = cfg.cfm.inference_cfg_rate
    t_span = cfm_t_span(n_timesteps, cfg.cfm.t_scheduler)
    ts = t_span[:-1]
    dts = t_span[1:] - t_span[:-1]

    mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    fv2 = None if frames_valid is None else \
        jnp.tile(jnp.broadcast_to(jnp.reshape(frames_valid, (-1,)), (B,)), 2)

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * B,), t, x.dtype)
        dphi = conditional_decoder(p, cfg.estimator, x2, mask2, mu2, t2, spks2,
                                   cond2, ctx, frames_valid=fv2)
        d_cond, d_uncond = dphi[:B], dphi[B:]
        dphi = (1.0 + r) * d_cond - r * d_uncond
        return (x + dt * dphi).astype(x.dtype), None

    x, _ = jax.lax.scan(step, z, (ts, dts))
    return x.astype(jnp.float32)


def cfm_solve_mean(
    p: P,
    cfg: FlowConfig,
    z: jax.Array,  # (B, 80, T) initial noise
    mask,  # (B, 1, T), or None == all-valid
    mu: jax.Array,  # (B, 80, T)
    spks: jax.Array,  # (B, 80)
    cond: jax.Array,  # (B, 80, T)
    n_timesteps: int,
    ctx: Ctx = EVAL,
    frames_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Few-step sampling with a MeanFlow-distilled average-velocity field
    (train/distill.py): y_s = y_t + (s - t) * u(y_t, t, s).

    Beyond-reference capability — the reference only has the 10-20 step
    Euler solve (flow_model.py:94-125).  No CFG batch doubling: guidance is
    folded into the student during distillation, so each of the 1-2 steps is
    ONE estimator call (vs 2x10..2x20 for the Euler path).  Requires params
    with the ``time_mlp_s`` branch (add_meanflow_time_branch)."""
    if n_timesteps < 1:
        # 0 steps would silently return the initial noise as the mel
        raise ValueError(f"meanflow n_timesteps must be >= 1, got {n_timesteps}")
    B = z.shape[0]
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)

    def step(x, ts_pair):
        t, s_t = ts_pair
        u = conditional_decoder(
            p, cfg.estimator, x, mask, mu, jnp.full((B,), t, x.dtype), spks,
            cond, ctx, frames_valid=frames_valid,
            s=jnp.full((B,), s_t, x.dtype))
        return (x + (s_t - t) * u).astype(x.dtype), None

    x, _ = jax.lax.scan(step, z, (t_span[:-1], t_span[1:]))
    return x.astype(jnp.float32)


def cfm_compute_loss(
    p: P,
    cfg: FlowConfig,
    rng: jax.Array,
    x1: jax.Array,  # (B, 80, T) target mel (normalized)
    mask: jax.Array,  # (B, 1, T) valid mask
    mu: jax.Array,  # (B, 80, T) encoder output
    spks: jax.Array,  # (B, 80)
    cond: jax.Array,  # (B, 80, T)
    ctx: Ctx,
    prompt_lens: Optional[jax.Array] = None,  # (B,) int
    leak: Optional[AntiLeakageConfig] = None,
    noise: Optional[tuple] = None,  # (t_uniform (B,1,1), z (B,80,T), cfg_uniform (B,))
) -> jax.Array:
    """OT-CFM loss with prompt masking + boundary weighting (flow_model.py:127-204).

    ``noise`` overrides the three random draws (pre-scheduler t uniform, z,
    CFG-dropout uniform) for deterministic parity tests against torch."""
    B, _, T = x1.shape
    leak = leak or AntiLeakageConfig()
    k_t, k_z, k_cfg = jax.random.split(rng, 3)

    if noise is not None:
        t, z, cfg_u = (jnp.asarray(a, x1.dtype) for a in noise)
    else:
        t = jax.random.uniform(k_t, (B, 1, 1), x1.dtype)
        z = jax.random.normal(k_z, x1.shape, x1.dtype)
        cfg_u = jax.random.uniform(k_cfg, (B,))
    if cfg.cfm.t_scheduler == "cosine":
        t = 1.0 - jnp.cos(t * 0.5 * PI)

    sigma = cfg.cfm.sigma_min
    y = (1.0 - (1.0 - sigma) * t) * z + t * x1
    u = x1 - (1.0 - sigma) * z

    if cfg.cfm.training_cfg_rate > 0:
        keep = (cfg_u > cfg.cfm.training_cfg_rate).astype(x1.dtype)
        mu = mu * keep[:, None, None]
        spks = spks * keep[:, None]
        cond = cond * keep[:, None, None]

    # sequence parallelism: under a seq-axis mesh (trainer's
    # sequence_sharding context) the estimator activations shard over T and
    # XLA inserts the attention all-gathers — identical math (parallel/sp.py)
    from ..parallel.sp import shard_seq

    y, mu, cond, mask = (shard_seq(a, 2) for a in (y, mu, cond, mask))
    pred = conditional_decoder(
        p, cfg.estimator, y, mask, mu, t[:, 0, 0], spks, cond, ctx, prompt_lens=prompt_lens
    )
    pred = shard_seq(pred, 2)

    loss_mask = mask
    if prompt_lens is not None:
        idx = jnp.arange(T)[None, :]
        pl = prompt_lens[:, None]
        w = jnp.where(idx < pl, 0.0, 1.0)
        if leak.boundary_loss_enabled:
            in_boundary = (idx >= pl) & (idx < pl + leak.boundary_frames) & (pl > 0)
            w = jnp.where(in_boundary, leak.boundary_loss_weight, w)
        loss_mask = loss_mask * w[:, None, :].astype(mask.dtype)

    # the weight rides INSIDE the square while the denominator is linear —
    # boundary frames get weight^2/weight = weight x extra emphasis.  That is
    # the reference's exact formula (flow_model.py:197-201: diff = (pred-u) *
    # loss_mask; (diff**2).sum() / (loss_mask.sum()*C)), kept for loss-curve
    # parity; do not "fix" to a conventional weighted MSE.
    diff = (pred - u) * loss_mask
    valid = jnp.sum(loss_mask) * u.shape[1]
    return jnp.sum(jnp.square(diff)) / jnp.maximum(valid, 1.0)


# ---------------------------------------------------------------------------
# MaskedDiffWithXvec
# ---------------------------------------------------------------------------


def normalize_mel(cfg, mel):
    return (mel - cfg.mel_mean) / cfg.mel_std


def denormalize_mel(cfg, mel):
    return mel * cfg.mel_std + cfg.mel_mean


from .llm import _l2_normalize  # torch F.normalize; one shared definition


def flow_encode(
    p: P,
    cfg: FlowConfig,
    token: jax.Array,  # (B, T_tok)
    token_len: jax.Array,  # (B,)
    ctx: Ctx,
) -> jax.Array:
    """input_embedding -> Conformer encoder -> encoder_proj (flow_model.py:299-305)."""
    T_tok = token.shape[1]
    tok_mask = M.make_non_pad_mask(token_len, T_tok)[:, :, None]
    emb = embedding(p, "input_embedding", token, clamp_min=0)
    emb = emb * tok_mask.astype(emb.dtype)
    h, _ = encoder_forward(
        p.sub("encoder"), cfg.encoder, emb, token_len, ctx,
        xscale=cfg.encoder_xscale, conformer=True,
    )
    return dense(p, "encoder_proj", h, ctx)


@dataclasses.dataclass
class FlowTrainStats:
    loss: jax.Array


def flow_forward_train(
    p: P,
    cfg: FlowConfig,
    rng: jax.Array,
    batch: Dict[str, jax.Array],
    ctx: Ctx,
    leak: AntiLeakageConfig = AntiLeakageConfig(),
    no_prompt: Union[bool, NoPromptConfig] = False,
    mel_norm: Optional[Tuple[float, float]] = (-6.0, 2.0),
    vendored_style: bool = False,
    noise: Optional[tuple] = None,  # deterministic override for cfm_compute_loss
) -> jax.Array:
    """Training forward with anti-leakage strategies (flow_model.py:248-400).

    batch keys: speech_token (B, T_tok), speech_token_len (B,),
    speech_feat (B, T, 80), speech_feat_len (B,), embedding (B, 192),
    optional cross_sample_mel (B, T, 80) + cross_sample_mel_len (B,).
    Returns scalar flow loss.

    vendored_style=True reproduces the stock CosyVoice training instead
    (cosyvoice/flow/flow.py:84-91): no mel normalization, simple conds
    (50%% prompt dropout, prompt length ~ U{0..0.3*feat_len}), no prompt-loss
    masking / boundary weighting / isolation.
    """
    if vendored_style:
        mel_norm = None
    mean, std = mel_norm if mel_norm is not None else (0.0, 1.0)
    token = batch["speech_token"]
    token_len = batch["speech_token_len"]
    feat = (batch["speech_feat"] - mean) / std  # online mel normalization
    feat_len = batch["speech_feat_len"]
    spk = batch["embedding"]

    B, T, _ = feat.shape
    k_strat = jax.random.fold_in(rng, 1)
    k_loss = jax.random.fold_in(rng, 2)

    spk = dense(p, "spk_embed_affine_layer", _l2_normalize(spk, axis=1), ctx)
    h = flow_encode(p, cfg, token, token_len, ctx)
    h = length_regulator(p.sub("length_regulator"), h, feat_len, T, cfg.regulator_stages, ctx)
    from ..parallel.sp import shard_seq

    h = shard_seq(h, 1)  # (B, T, C): mel-rate activations shard over seq

    feat_bc = feat.transpose(0, 2, 1)  # (B, 80, T)
    mask = M.make_non_pad_mask(feat_len, T)[:, None, :].astype(h.dtype)

    if no_prompt:
        np_cfg = no_prompt if isinstance(no_prompt, NoPromptConfig) else NoPromptConfig()
        if np_cfg.mode == "mixed":
            # flow_model.py:443-457: per-sample, no prompt with prob
            # no_prompt_ratio, else a short prompt ~ randint(1, max(2, 0.1*j))
            # (inclusive) copied from the sample's own mel
            ks = jax.random.split(k_strat, 2)
            bare = jax.random.uniform(ks[0], (B,)) < np_cfg.no_prompt_ratio
            j = feat_len.astype(jnp.int32)
            top = jnp.maximum(2, (0.1 * j).astype(jnp.int32))
            plen = 1 + (jax.random.uniform(ks[1], (B,)) * top).astype(jnp.int32)
            plen = jnp.where(bare, 0, jnp.minimum(plen, top))
            idx = jnp.arange(T)[None, :]
            conds = jnp.where((idx < plen[:, None])[:, :, None], feat, 0.0)
            conds = conds.transpose(0, 2, 1)
            prompt_lens = plen
        else:  # 'full': 100% promptless
            conds = jnp.zeros_like(feat_bc)
            prompt_lens = jnp.zeros((B,), jnp.int32)
        return cfm_compute_loss(
            p.sub("decoder.estimator"), cfg, k_loss, feat_bc, mask, h.transpose(0, 2, 1),
            spk, conds, ctx, prompt_lens=prompt_lens, leak=leak, noise=noise,
        )

    if vendored_style:
        # stock conds: 50% none, else U{0..0.3*len} prompt frames (flow.py:84-91)
        ks = jax.random.split(k_strat, 2)
        drop = jax.random.bernoulli(ks[0], 0.5, (B,))
        # random.randint(0, int(0.3*j)) is INCLUSIVE of int(0.3*j): uniform
        # over {0..K} with K = floor(0.3*j) — the +1 must apply after the
        # floor or the top value draws non-uniform mass
        k_top = (0.3 * feat_len).astype(jnp.int32)
        plen = jnp.minimum(
            (jax.random.uniform(ks[1], (B,)) * (k_top + 1)).astype(jnp.int32),
            k_top)
        plen = jnp.where(drop, 0, plen)
        idx = jnp.arange(T)[None, :]
        conds = jnp.where((idx < plen[:, None])[:, :, None], feat, 0.0).transpose(0, 2, 1)
        return cfm_compute_loss(
            p.sub("decoder.estimator"), cfg, k_loss, feat_bc, mask, h.transpose(0, 2, 1),
            spk, conds, ctx, prompt_lens=None, leak=leak, noise=noise,
        )

    # ---- anti-leakage strategy draws (vectorized; flow_model.py:309-385) ----
    ks = jax.random.split(k_strat, 4)
    j = feat_len.astype(jnp.int32)

    # strategy 3: prompt dropout
    dropped = (
        jax.random.uniform(ks[0], (B,)) < leak.prompt_dropout_prob
        if leak.prompt_dropout_enabled
        else jnp.zeros((B,), bool)
    )

    # strategy 2: dynamic prompt length ~ randint[min_idx, max_idx] inclusive
    if leak.dynamic_prompt_enabled:
        min_idx = jnp.maximum(1, (leak.prompt_min_ratio * j).astype(jnp.int32))
        max_idx = jnp.maximum(min_idx + 1, (leak.prompt_max_ratio * j).astype(jnp.int32))
        span = max_idx - min_idx + 1
        prompt_lens = min_idx + (jax.random.uniform(ks[1], (B,)) * span).astype(jnp.int32)
    else:
        prompt_lens = jnp.maximum(1, (0.3 * j).astype(jnp.int32))

    # strategy 5: cross-sample prompt source
    cross_mel = batch.get("cross_sample_mel")
    if leak.cross_sample_enabled and cross_mel is not None:
        cross_mel = (cross_mel - mean) / std
        # the collate pads cross_sample_mel to its own bucket (default 100
        # frames) — align it to the feat length before the select; frames
        # beyond cross_len are never read (prompt_lens <= cross_len below)
        Tc = cross_mel.shape[1]
        if Tc < T:
            cross_mel = jnp.pad(cross_mel, ((0, 0), (0, T - Tc), (0, 0)))
        elif Tc > T:
            cross_mel = cross_mel[:, :T]
        cross_len = batch["cross_sample_mel_len"].astype(jnp.int32)
        use_cross = cross_len > 0
        prompt_lens = jnp.where(use_cross, jnp.minimum(prompt_lens, cross_len), prompt_lens)
        prompt_src = jnp.where(use_cross[:, None, None], cross_mel, feat)
    else:
        prompt_src = feat

    prompt_lens = jnp.where(dropped, 0, prompt_lens)

    idx = jnp.arange(T)[None, :]
    in_prompt = idx < prompt_lens[:, None]  # (B, T)
    conds = jnp.where(in_prompt[:, :, None], prompt_src, 0.0)
    # text blinding (strategy 6 below) covers only the ORIGINAL prompt
    # region — the reference zeroes h[:prompt_len] with the pre-silence
    # length (flow_model.py:383-385), even when the recorded prompt_lens
    # gains the silence band
    in_blind = in_prompt

    # strategy 1: silence isolation band (disabled by default; config.py:111)
    if leak.silence_padding_enabled:
        sil_tok = jax.random.randint(ks[3], (B,), leak.silence_min_tokens, leak.silence_max_tokens + 1)
        sil_frames = jnp.clip((sil_tok * 22050 // 256 // cfg.input_frame_rate), 3, 20)
        fits = (prompt_lens + sil_frames < j) & (prompt_lens > 0)
        sil_val = (leak.silence_mel_value - mean) / std
        in_sil = (idx >= prompt_lens[:, None]) & (idx < (prompt_lens + sil_frames)[:, None]) & fits[:, None]
        conds = jnp.where(in_sil[:, :, None], sil_val, conds)
        prompt_lens = jnp.where(fits, prompt_lens + sil_frames, prompt_lens)

    # strategy 6: text blinding — zero encoder output in the prompt region
    if leak.text_blinding_enabled:
        blind = jax.random.uniform(ks[2], (B,)) < leak.text_blinding_prob
        h = jnp.where((blind[:, None] & in_blind)[:, :, None], 0.0, h)

    conds = conds.transpose(0, 2, 1)  # (B, 80, T)
    return cfm_compute_loss(
        p.sub("decoder.estimator"), cfg, k_loss, feat_bc, mask, h.transpose(0, 2, 1),
        spk, conds, ctx, prompt_lens=prompt_lens, leak=leak, noise=noise,
    )


def flow_inference(
    p: P,
    cfg: FlowConfig,
    rng: jax.Array,
    token: jax.Array,  # (1, T_tok) target speech tokens
    prompt_token: jax.Array,  # (1, T_ptok) may be width 0
    prompt_feat: jax.Array,  # (1, T_pmel, 80) raw (unnormalized) prompt mel
    spk_embedding: jax.Array,  # (1, 192)
    n_timesteps: Optional[int] = None,
    finetuned_norm: bool = False,
    mel_norm: Tuple[float, float] = (-6.0, 2.0),
    flow_cache: Optional[jax.Array] = None,  # (1, 80, C, 2) z/mu carry
    return_cache: bool = False,
    token_valid: Optional[jax.Array] = None,  # traced: true token count
    mel_valid: Optional[jax.Array] = None,  # traced: true mel frames
    lora: Optional[Dict[str, jax.Array]] = None,  # serve un-merged adapters
    lora_scale: float = 1.0,
    sampler: str = "euler",  # "euler" | "meanflow" (distilled weights only)
):
    """Prompted inference (flow_model.py:475-551).  Python-int lengths -> one
    compiled program per (T_tok, T_ptok, T_pmel) bucket.

    ``sampler="meanflow"`` runs the few-step distilled sampler
    (cfm_solve_mean; default 2 steps when n_timesteps is None) — requires
    weights produced by train/distill.py.

    finetuned_norm=True applies the merged-finetune normalize/denormalize patch
    (reference: inference_joint.py:129-151).

    ``flow_cache`` carries the prompt-region + last-34-frame z/mu across
    streamed chunks so consecutive windows share noise (flow_model.py:74-92).
    With return_cache=True returns (mel, new_cache).

    ``token_valid``/``mel_valid`` (traced scalars, prompt-free only): the
    length-masked serving bucket — ``token`` is padded to a static bucket and
    ONE compiled program serves every true length in it (every per-length
    program otherwise costs a fresh XLA compile in serving, minutes through a
    remote runtime).  The first ``mel_valid`` output frames equal the
    unpadded program's output (masked convs/statistics throughout; the z
    noise draw differs in shape, which is distribution-preserving — the
    reference draws its own rng anyway).  ``lora``: serve un-merged flow
    adapters (single voice, flat ``*.lora_A/B`` dict) for this request —
    multi-voice serving keeps ONE base flow model plus per-voice adapter
    dicts instead of a merged copy per voice.  Callers slice
    ``feat[:, :, :mel_valid]`` and should pass ``n_timesteps`` computed from
    the TRUE length."""
    ctx = EVAL if lora is None else Ctx(lora=lora, lora_scale=lora_scale)
    mean, std = mel_norm
    T_ptok = prompt_token.shape[1]
    T_tok = token.shape[1]

    spk = dense(p, "spk_embed_affine_layer", _l2_normalize(spk_embedding, axis=1), ctx)

    if token_valid is not None:
        assert T_ptok == 0 and prompt_feat.shape[1] == 0, \
            "length-masked bucket path is prompt-free"
        assert not return_cache, "bucketed (final) chunks do not emit a cache"
        assert mel_valid is not None and n_timesteps is not None

    full_token = jnp.concatenate([prompt_token, token], axis=1)
    token_len = (jnp.asarray([T_ptok + T_tok], jnp.int32) if token_valid is None
                 else jnp.reshape(token_valid, (1,)).astype(jnp.int32))
    h = flow_encode(p, cfg, full_token, token_len, ctx)

    mel_len1 = prompt_feat.shape[1]
    mel_len2 = int(T_tok / cfg.input_frame_rate * 22050 / 256)
    T = mel_len1 + mel_len2

    if token_valid is not None:
        h = length_regulator_inference_valid(
            p.sub("length_regulator"), h, token_valid, mel_len2, mel_valid,
            cfg.regulator_stages, cfg.input_frame_rate,
        )
    else:
        h = length_regulator_inference(
            p.sub("length_regulator"), h[:, :T_ptok], h[:, T_ptok:],
            mel_len1, mel_len2, cfg.regulator_stages, cfg.input_frame_rate,
        )

    if finetuned_norm:
        prompt_feat = (prompt_feat - mean) / std

    conds = jnp.zeros((1, T, cfg.output_size), h.dtype)
    if mel_len1 > 0:
        conds = conds.at[:, :mel_len1].set(prompt_feat)
    conds = conds.transpose(0, 2, 1)

    if n_timesteps is None:
        n_timesteps = (20 if T > 500 else (15 if T > 300 else 10)) \
            if sampler == "euler" else 2

    # pad to even length for the U-Net; masked region is dropped afterwards.
    # Even T needs no padding — take the mask-free dense fast path.
    T_pad = T + (T % 2)
    if token_valid is not None:
        mask = (jnp.arange(T_pad)[None, None, :] < mel_valid).astype(h.dtype)
    else:
        mask = None if T_pad == T else \
            jnp.zeros((1, 1, T_pad), h.dtype).at[:, :, :T].set(1.0)
    mu = jnp.pad(h.transpose(0, 2, 1), ((0, 0), (0, 0), (0, T_pad - T)))
    conds = jnp.pad(conds, ((0, 0), (0, 0), (0, T_pad - T)))
    z = jax.random.normal(rng, (1, cfg.output_size, T_pad), h.dtype)

    # streamed-chunk consistency: overwrite the head with the cached z/mu
    # (flow_model.py:79-86)
    if flow_cache is not None and flow_cache.shape[2] != 0:
        cs = min(flow_cache.shape[2], T_pad)
        z = z.at[:, :, :cs].set(flow_cache[:, :, :cs, 0].astype(z.dtype))
        mu = mu.at[:, :, :cs].set(flow_cache[:, :, :cs, 1].astype(mu.dtype))
    if return_cache:
        z_cache = jnp.concatenate([z[:, :, :mel_len1], z[:, :, T - 34 : T]], axis=2) \
            if mel_len1 > 0 else z[:, :, T - 34 : T]
        mu_cache = jnp.concatenate([mu[:, :, :mel_len1], mu[:, :, T - 34 : T]], axis=2) \
            if mel_len1 > 0 else mu[:, :, T - 34 : T]
        new_cache = jnp.stack([z_cache, mu_cache], axis=-1)

    solve = cfm_solve_euler if sampler == "euler" else cfm_solve_mean
    feat = solve(p.sub("decoder.estimator"), cfg, z, mask, mu, spk,
                 conds, n_timesteps, ctx,
                 frames_valid=(None if token_valid is None else mel_valid))
    feat = feat[:, :, mel_len1:T]
    if finetuned_norm:
        feat = feat * std + mean
    if token_valid is not None:
        # pad region still carries z-noise (the solve only writes masked
        # velocity); downstream masked HiFT requires exact zeros there
        feat = feat * (jnp.arange(feat.shape[2])[None, None, :] < mel_valid)
    if return_cache:
        return feat, new_cache
    return feat


def flow_inference_like_training(
    p: P,
    cfg: FlowConfig,
    rng: jax.Array,
    token: jax.Array,  # (1, T_tok) COMPLETE speech-token sequence (no split)
    feat_len: int,  # target mel frame count
    spk_embedding: jax.Array,  # (1, 192)
    prompt_feat: Optional[jax.Array] = None,  # (1, T_pmel, 80), cond-only
    prompt_len: int = 0,
    n_timesteps: Optional[int] = None,
) -> jax.Array:
    """Inference matching the training forward exactly
    (flow_model.py:553-638 inference_like_training): the full token sequence
    goes through the TRAINING-style length regulator (single interpolation to
    feat_len — no prompt/target seam), the optional prompt mel enters only as
    conditioning, and the FULL mel (prompt region included) is returned.

    Use for diagnosing train/inference mismatch: a model whose training loss
    is healthy must produce clean mel through this path; divergence from
    ``flow_inference`` isolates the seam/trim machinery."""
    ctx = EVAL
    T = int(feat_len)
    T_tok = token.shape[1]

    spk = dense(p, "spk_embed_affine_layer", _l2_normalize(spk_embedding, axis=1), ctx)
    h = flow_encode(p, cfg, token, jnp.asarray([T_tok], jnp.int32), ctx)
    h = length_regulator(p.sub("length_regulator"), h,
                         jnp.asarray([T], jnp.int32), T, cfg.regulator_stages, ctx)

    conds = jnp.zeros((1, T, cfg.output_size), h.dtype)
    if prompt_feat is not None and prompt_len > 0:
        n = min(prompt_len, prompt_feat.shape[1], T)
        conds = conds.at[:, :n].set(prompt_feat[:, :n].astype(h.dtype))
    conds = conds.transpose(0, 2, 1)

    # dynamic NFE identical to inference() (flow_model.py:617-624)
    if n_timesteps is None or n_timesteps == 10:
        n_timesteps = 20 if T > 500 else (15 if T > 300 else 10)

    T_pad = T + (T % 2)
    mask = None if T_pad == T else \
        jnp.zeros((1, 1, T_pad), h.dtype).at[:, :, :T].set(1.0)
    mu = jnp.pad(h.transpose(0, 2, 1), ((0, 0), (0, 0), (0, T_pad - T)))
    conds = jnp.pad(conds, ((0, 0), (0, 0), (0, T_pad - T)))
    z = jax.random.normal(rng, (1, cfg.output_size, T_pad), h.dtype)
    feat = cfm_solve_euler(p.sub("decoder.estimator"), cfg, z, mask, mu, spk,
                           conds, n_timesteps, ctx)
    return feat[:, :, :T]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_flow_params(key: jax.Array, cfg: FlowConfig) -> Params:
    d: Params = {}
    kg = KeyGen(key)
    init_embedding(kg(), d, "input_embedding", cfg.vocab_size, cfg.input_size)
    init_linear(kg(), d, "spk_embed_affine_layer", cfg.spk_embed_dim, cfg.output_size)
    init_encoder(kg, d, "encoder", cfg.encoder, conformer=True)
    init_linear(kg(), d, "encoder_proj", cfg.encoder.output_size, cfg.output_size)
    for s in range(cfg.regulator_stages):
        init_conv1d(kg(), d, f"length_regulator.model.{3 * s}", cfg.output_size, cfg.output_size, 3)
        init_norm(d, f"length_regulator.model.{3 * s + 1}", cfg.output_size)
    init_conv1d(kg(), d, f"length_regulator.model.{3 * cfg.regulator_stages}",
                cfg.output_size, cfg.output_size, 1)
    init_conditional_decoder(kg, d, "decoder.estimator", cfg.estimator)
    return d
