"""HiFiGAN adversarial training: discriminators + GAN losses.

Reference behavior:
- cosyvoice/hifigan/hifigan.py (HiFiGan generator/discriminator turns)
- cosyvoice/hifigan/discriminator.py (MultipleDiscriminator = MPD + MRD)
- matcha/hifigan/models.py:209-368 (DiscriminatorP, feature/generator/
  discriminator losses)
- cosyvoice/utils/losses.py (tpr_loss, mel_loss, DPOLoss)

Functional JAX re-implementation over flat param dicts; weight_norm
parameterizations (weight_g / weight_v) are computed on the fly by the conv
primitives so the adversarial optimization dynamics match torch training.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HiFTConfig
from ..ctx import Ctx, EVAL
from ..params import P, Params, KeyGen
from ..layers.basic import conv2d, leaky_relu
from ..ops import audio as A
from . import hift as H

LRELU_SLOPE = 0.1

MPD_PERIODS = (2, 3, 5, 7, 11)
MRD_FFT_SIZES = (2048, 1024, 512)
MRD_BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------


def discriminator_p(p: P, x: jax.Array, period: int) -> Tuple[jax.Array, List[jax.Array]]:
    """HiFi-GAN period discriminator (matcha models.py:209-244).
    x: (B, 1, T) -> (score map, feature maps)."""
    B, C, T = x.shape
    if T % period != 0:
        pad = period - (T % period)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect")
        T += pad
    x = x.reshape(B, C, T // period, period)
    fmap = []
    for i in range(5):
        stride = (3, 1) if i < 4 else (1, 1)
        x = conv2d(p, f"convs.{i}", x, stride=stride, padding=(2, 0))
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = conv2d(p, "conv_post", x, padding=(1, 0))
    fmap.append(x)
    return x.reshape(B, -1), fmap


def _spectrogram_2ch(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """DC-removed, peak-normalized complex STFT as 2 channels
    (discriminator.py:118-129): (B, T) -> (B, 2, frames, F)."""
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    x = 0.8 * x / (jnp.max(jnp.abs(x), axis=-1, keepdims=True) + 1e-9)
    s_re, s_im = A.stft_center(x, n_fft, hop)  # (B, F, T) each
    return jnp.stack([s_re, s_im], axis=1).transpose(0, 1, 3, 2)


def discriminator_r(p: P, x: jax.Array, window_length: int) -> Tuple[jax.Array, List[jax.Array]]:
    """Multi-band resolution discriminator (discriminator.py:81-152).
    x: (B, T) -> (score map, feature maps)."""
    hop = int(window_length * 0.25)
    spec = _spectrogram_2ch(x, window_length, hop)  # (B, 2, T', F)
    n_fft_bins = window_length // 2 + 1
    bands = [(int(lo * n_fft_bins), int(hi * n_fft_bins)) for lo, hi in MRD_BANDS]

    fmap = []
    outs = []
    for bi, (lo, hi) in enumerate(bands):
        band = spec[..., lo:hi]
        for i in range(5):
            stride = (1, 1) if i in (0, 4) else (1, 2)
            padding = (1, 4) if i < 4 else (1, 1)
            band = conv2d(p.sub(f"band_convs.{bi}"), f"{i}", band, stride=stride, padding=padding)
            band = leaky_relu(band, 0.1)
            if i > 0:
                fmap.append(band)
        outs.append(band)
    x = jnp.concatenate(outs, axis=-1)
    x = conv2d(p, "conv_post", x, padding=(1, 1))
    fmap.append(x)
    return x, fmap


def multiple_discriminator(
    p: P, y: jax.Array, y_hat: jax.Array
) -> Tuple[List[jax.Array], List[jax.Array], List[List[jax.Array]], List[List[jax.Array]]]:
    """MPD + MRD over (real, generated) (discriminator.py:15-38).
    y/y_hat: (B, T)."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for i, period in enumerate(MPD_PERIODS):
        sp = p.sub(f"mpd.discriminators.{i}")
        r, fr = discriminator_p(sp, y[:, None, :], period)
        g, fg = discriminator_p(sp, y_hat[:, None, :], period)
        y_d_rs.append(r)
        y_d_gs.append(g)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    for i, w in enumerate(MRD_FFT_SIZES):
        sp = p.sub(f"mrd.discriminators.{i}")
        r, fr = discriminator_r(sp, y, w)
        g, fg = discriminator_r(sp, y_hat, w)
        y_d_rs.append(r)
        y_d_gs.append(g)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def generator_adv_loss(disc_outputs: List[jax.Array]) -> jax.Array:
    """sum mean((1 - dg)^2) (matcha models.py:360-368)."""
    return sum(jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32))) for dg in disc_outputs)


def discriminator_adv_loss(real: List[jax.Array], gen: List[jax.Array]) -> jax.Array:
    """sum mean((1 - dr)^2) + mean(dg^2) (matcha models.py:346-357)."""
    loss = 0.0
    for dr, dg in zip(real, gen):
        loss = loss + jnp.mean(jnp.square(1.0 - dr.astype(jnp.float32)))
        loss = loss + jnp.mean(jnp.square(dg.astype(jnp.float32)))
    return loss


def feature_match_loss(fmap_r, fmap_g) -> jax.Array:
    """2 * sum mean |fr - fg| (matcha models.py:337-343)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32)))
    return loss * 2.0


def tpr_loss(disc_real: List[jax.Array], disc_gen: List[jax.Array], tau: float) -> jax.Array:
    """Truncated pointwise relativistic loss (losses.py:6-12).

    The masked mean over {dr < dg + median} is computed densely with a weight
    mask (static shapes)."""
    loss = 0.0
    for dr, dg in zip(disc_real, disc_gen):
        diff = (dr - dg).astype(jnp.float32).reshape(-1)
        m = jnp.median(diff)
        sel = diff < m
        sq = jnp.square(diff - m)
        cnt = jnp.maximum(jnp.sum(sel), 1)
        l_rel = jnp.sum(jnp.where(sel, sq, 0.0)) / cnt
        loss = loss + tau - jax.nn.relu(tau - l_rel)
    return loss


def multi_mel_loss(real: jax.Array, gen: jax.Array, mel_configs=None) -> jax.Array:
    """sum_i L1(mel_i(gen), mel_i(real)) (losses.py:15-21); default single
    transform at the model mel config."""
    mel_configs = mel_configs or [dict(n_fft=1024, n_mels=80, sr=22050, hop=256, win=1024)]
    loss = 0.0
    for c in mel_configs:
        mr = A.mel_spectrogram(real, **c)
        mg = A.mel_spectrogram(gen, **c)
        loss = loss + jnp.mean(jnp.abs(mg - mr))
    return loss


def dpo_loss(
    policy_chosen_logps: jax.Array,
    policy_rejected_logps: jax.Array,
    reference_chosen_logps: jax.Array,
    reference_rejected_logps: jax.Array,
    beta: float = 0.01,
    label_smoothing: float = 0.0,
    ipo: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """DPO preference loss (losses.py:24-68)."""
    pi = policy_chosen_logps - policy_rejected_logps
    ref = reference_chosen_logps - reference_rejected_logps
    logits = pi - ref
    if ipo:
        losses = jnp.square(logits - 1.0 / (2.0 * beta))
    else:
        losses = (
            -jax.nn.log_sigmoid(beta * logits) * (1 - label_smoothing)
            - jax.nn.log_sigmoid(-beta * logits) * label_smoothing
        )
    loss = jnp.mean(losses)
    chosen_r = jax.lax.stop_gradient(beta * (policy_chosen_logps - reference_chosen_logps))
    rejected_r = jax.lax.stop_gradient(beta * (policy_rejected_logps - reference_rejected_logps))
    return loss, chosen_r, rejected_r


# ---------------------------------------------------------------------------
# HiFiGan turns (hifigan.py:22-74)
# ---------------------------------------------------------------------------


def hift_forward_train(
    gen_params: P, cfg: HiFTConfig, rng: jax.Array, mel: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Training generator forward: mel (B, 80, T) -> (wav (B, T*256), f0 (B, T))."""
    up_total = int(np.prod(cfg.upsample_rates)) * cfg.istft_hop_len
    f0 = H.f0_predict(gen_params.sub("f0_predictor"), mel)
    f0_up = (
        jnp.broadcast_to(f0[:, None, :, None], (f0.shape[0], 1, f0.shape[1], up_total))
        .reshape(f0.shape[0], 1, -1)
    )
    s = H.sine_source(gen_params.sub("m_source"), cfg, rng, f0_up)
    wav = H.hift_decode(gen_params, cfg, mel, s)
    return wav, f0


def hifigan_generator_loss(
    gen_params: Params,
    disc_params: Params,
    cfg: HiFTConfig,
    rng: jax.Array,
    batch: Dict[str, jax.Array],  # speech (B, T*256), speech_feat (B, T, 80), pitch_feat (B, T)
    mel_weight: float = 45.0,
    feat_match_weight: float = 2.0,
    tpr_weight: float = 1.0,
    tpr_tau: float = 0.04,
) -> Dict[str, jax.Array]:
    real = batch["speech"]
    mel = batch["speech_feat"].transpose(0, 2, 1)
    gen, f0 = hift_forward_train(P(gen_params), cfg, rng, mel)
    n = min(real.shape[-1], gen.shape[-1])
    real, gen = real[:, :n], gen[:, :n]

    y_d_rs, y_d_gs, fmap_rs, fmap_gs = multiple_discriminator(P(disc_params), real, gen)
    loss_gen = generator_adv_loss(y_d_gs)
    loss_fm = feature_match_loss(fmap_rs, fmap_gs)
    loss_mel = multi_mel_loss(real, gen)
    loss_tpr = tpr_loss(y_d_gs, y_d_rs, tpr_tau) if tpr_weight != 0 else jnp.zeros(())
    loss_f0 = jnp.mean(jnp.abs(f0 - batch["pitch_feat"]))
    loss = (loss_gen + feat_match_weight * loss_fm + mel_weight * loss_mel
            + tpr_weight * loss_tpr + loss_f0)
    return {"loss": loss, "loss_gen": loss_gen, "loss_fm": loss_fm,
            "loss_mel": loss_mel, "loss_tpr": loss_tpr, "loss_f0": loss_f0}


def hifigan_discriminator_loss(
    gen_params: Params,
    disc_params: Params,
    cfg: HiFTConfig,
    rng: jax.Array,
    batch: Dict[str, jax.Array],
    tpr_weight: float = 1.0,
    tpr_tau: float = 0.04,
) -> Dict[str, jax.Array]:
    real = batch["speech"]
    mel = batch["speech_feat"].transpose(0, 2, 1)
    gen, _ = hift_forward_train(P(gen_params), cfg, rng, mel)
    gen = jax.lax.stop_gradient(gen)
    n = min(real.shape[-1], gen.shape[-1])
    real, gen = real[:, :n], gen[:, :n]

    y_d_rs, y_d_gs, _, _ = multiple_discriminator(P(disc_params), real, gen)
    loss_disc = discriminator_adv_loss(y_d_rs, y_d_gs)
    loss_tpr = tpr_loss(y_d_rs, y_d_gs, tpr_tau) if tpr_weight != 0 else jnp.zeros(())
    loss = loss_disc + tpr_weight * loss_tpr
    return {"loss": loss, "loss_disc": loss_disc, "loss_tpr": loss_tpr}


# ---------------------------------------------------------------------------
# Initialization (weight-norm parameterization: weight_g / weight_v)
# ---------------------------------------------------------------------------


def _init_wn_conv2d(kg, d: Params, name: str, in_c: int, out_c: int, kh: int, kw: int):
    k1, k2 = jax.random.split(kg())
    fan_in = in_c * kh * kw
    bound = math.sqrt(1.0 / fan_in)
    v = jax.random.uniform(k1, (out_c, in_c, kh, kw), jnp.float32, -bound, bound)
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2, 3), keepdims=True))
    d[name + ".weight_v"] = v
    d[name + ".weight_g"] = norm
    d[name + ".bias"] = jax.random.uniform(k2, (out_c,), jnp.float32, -bound, bound)


def init_discriminator_params(key: jax.Array, channels: int = 32) -> Params:
    """MultipleDiscriminator params (MPD 5 periods + MRD 3 resolutions)."""
    d: Params = {}
    kg = KeyGen(key)
    chs = [1, 32, 128, 512, 1024, 1024]
    for i in range(len(MPD_PERIODS)):
        pre = f"mpd.discriminators.{i}"
        for j in range(5):
            _init_wn_conv2d(kg, d, f"{pre}.convs.{j}", chs[j], chs[j + 1], 5, 1)
        _init_wn_conv2d(kg, d, f"{pre}.conv_post", 1024, 1, 3, 1)
    for i in range(len(MRD_FFT_SIZES)):
        pre = f"mrd.discriminators.{i}"
        for b in range(len(MRD_BANDS)):
            _init_wn_conv2d(kg, d, f"{pre}.band_convs.{b}.0", 2, channels, 3, 9)
            for j in range(1, 4):
                _init_wn_conv2d(kg, d, f"{pre}.band_convs.{b}.{j}", channels, channels, 3, 9)
            _init_wn_conv2d(kg, d, f"{pre}.band_convs.{b}.4", channels, channels, 3, 3)
        _init_wn_conv2d(kg, d, f"{pre}.conv_post", channels, 1, 3, 3)
    return d
