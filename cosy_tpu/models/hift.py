"""HiFT NSF-iSTFT vocoder: mel (B, 80, T) -> waveform (B, T*256).

Reference behavior: cosyvoice/hifigan/generator.py (HiFTGenerator, SineGen,
SourceModuleHnNSF, ResBlock) and f0_predictor.py (ConvRNNF0Predictor).

TPU-first notes:
- weight_norm is folded into plain weights at load time (compat.fold_weight_norm)
  — the runtime graph sees only dense convs, which XLA fuses;
- the tiny 16-point iSTFT head is expressed as framing matmuls + irfft
  (ops/audio.istft) instead of torch.istft;
- the sine source's random phases / additive noise take an explicit PRNG key.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HiFTConfig
from ..ctx import Ctx, EVAL
from ..params import P, Params
from ..layers.basic import (conv1d, conv1d_gemm, conv_transpose1d, dense,
                            leaky_relu, snake)
from ..ops.audio import istft, stft_center
from .flow import interpolate_linear


def _get_padding(kernel: int, dilation: int = 1) -> int:
    return (kernel * dilation - dilation) // 2


# ---------------------------------------------------------------------------
# f0 predictor (ConvRNNF0Predictor)
# ---------------------------------------------------------------------------


def f0_predict(p: P, mel: jax.Array, ctx: Ctx = EVAL,
               mel_valid=None) -> jax.Array:
    """(B, 80, T) -> (B, T) f0 in Hz (f0_predictor.py:22-58).

    ``mel_valid`` (traced): re-zero pad frames after every conv so the valid
    region equals the unpadded computation (elu(bias) is nonzero in the pad
    region and would leak back through the next conv's window otherwise)."""
    x = mel
    mask = None
    if mel_valid is not None:
        mask = (jnp.arange(mel.shape[-1])[None, None, :]
                < mel_valid).astype(mel.dtype)
        x = x * mask
    for i in range(5):
        x = conv1d(p, f"condnet.{2 * i}", x, padding=1, ctx=ctx)
        x = jax.nn.elu(x)
        if mask is not None:
            x = x * mask
    x = x.transpose(0, 2, 1)
    return jnp.abs(dense(p, "classifier", x, ctx))[:, :, 0]


# ---------------------------------------------------------------------------
# NSF sine source
# ---------------------------------------------------------------------------


def sine_source(
    p: P,
    cfg: HiFTConfig,
    rng: jax.Array,
    f0_up: jax.Array,  # (B, 1, L) upsampled f0 in Hz
) -> jax.Array:
    """(B, 1, L) harmonic excitation (generator.py:109-223).

    SineGen: per-harmonic phase accumulation with random initial phases
    (fundamental phase fixed to 0), voiced/unvoiced gating, additive noise;
    SourceModuleHnNSF: tanh(linear(harmonics)).
    """
    B, _, L = f0_up.shape
    H = cfg.nb_harmonics + 1
    k_phase, k_noise = jax.random.split(rng)

    harmonics = jnp.arange(1, H + 1, dtype=jnp.float32)[None, :, None]
    F_mat = f0_up * harmonics / cfg.sampling_rate  # (B, H, L)
    theta = 2.0 * jnp.pi * (jnp.cumsum(F_mat, axis=-1) % 1.0)
    phase = jax.random.uniform(k_phase, (B, H, 1), minval=-jnp.pi, maxval=jnp.pi)
    phase = phase.at[:, 0, :].set(0.0)
    sine = cfg.nsf_alpha * jnp.sin(theta + phase)

    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)  # (B, 1, L)
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    noise = noise_amp * jax.random.normal(k_noise, sine.shape)
    sine = sine * uv + noise  # (B, H, L)

    merged = jnp.tanh(dense(p, "l_linear", sine.transpose(0, 2, 1)))  # (B, L, 1)
    return merged.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# ResBlock
# ---------------------------------------------------------------------------


def resblock(p: P, name: str, x: jax.Array, kernel: int, dilations: Tuple[int, ...], ctx: Ctx,
             mask=None, gemm: bool = False) -> jax.Array:
    """Snake-activated dilated residual block (generator.py:46-101).

    ``mask`` (B, 1, L) or None: length-masked serving variant — conv outputs
    are re-zeroed in the pad region (conv bias makes it nonzero, and the next
    conv's window would leak it back into the valid tail).  snake(0)=0, so
    activations preserve the zeros.  ``gemm``: im2col-GEMM conv formulation
    (HiFTConfig.gemm_convs)."""
    conv = conv1d_gemm if gemm else conv1d
    sp = p.sub(name)
    for i, d in enumerate(dilations):
        xt = snake(x, p[f"{name}.activations1.{i}.alpha"].astype(jnp.float32))
        xt = conv(sp, f"convs1.{i}", xt, padding=_get_padding(kernel, d), dilation=d, ctx=ctx)
        if mask is not None:
            xt = xt * mask
        xt = snake(xt, p[f"{name}.activations2.{i}.alpha"].astype(jnp.float32))
        xt = conv(sp, f"convs2.{i}", xt, padding=_get_padding(kernel, 1), ctx=ctx)
        if mask is not None:
            xt = xt * mask
        x = xt + x
    return x


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def hift_decode(
    p: P,
    cfg: HiFTConfig,
    mel: jax.Array,  # (B, 80, T)
    source: jax.Array,  # (B, 1, T * prod(up) * hop)
    ctx: Ctx = EVAL,
    mel_valid=None,  # traced scalar: true mel frames (bucket-padded serving)
) -> jax.Array:
    """Deterministic decode given an excitation source (generator.py:520-552).

    ``mel_valid``: length-masked serving variant — every conv output is
    re-zeroed beyond the level's valid length, so samples below
    ``mel_valid * prod(up) * hop`` equal the unpadded program's output and
    ONE compiled program serves every true length in the bucket.  Requires
    ``mel`` and ``source`` already zeroed beyond the valid region, with the
    source's end carrying the stft reflect pad (see hift_inference)."""
    n_fft, hop = cfg.istft_n_fft, cfg.istft_hop_len
    s_re, s_im = stft_center(source[:, 0, :], n_fft, hop)  # (B, F, Ts) each
    s_stft = jnp.concatenate([s_re, s_im], axis=1)  # (B, n_fft+2, Ts)

    def vmask(length, valid):
        return (jnp.arange(length)[None, None, :] < valid).astype(mel.dtype)

    if mel_valid is not None:
        # valid stft frames: one per hop sample of the valid source + 1
        # (center framing), matching the unpadded program's frame count
        sf_valid = mel_valid * int(np.prod(cfg.upsample_rates)) + 1
        s_stft = s_stft * vmask(s_stft.shape[-1], sf_valid)

    _genv = os.environ.get("COSY_TPU_HIFT_GEMM")
    if _genv not in (None, "", "0", "1"):  # "" = unset the shell way
        raise ValueError(
            f"COSY_TPU_HIFT_GEMM must be '0' or '1', got {_genv!r}")
    gemm = cfg.gemm_convs if not _genv else _genv == "1"
    conv_s1 = conv1d_gemm if gemm else conv1d  # stride-1 decode convs only

    x = conv_s1(p, "conv_pre", mel, padding=3, ctx=ctx)
    if mel_valid is not None:
        x = x * vmask(x.shape[-1], mel_valid)
    num_up = len(cfg.upsample_rates)
    nk = len(cfg.resblock_kernel_sizes)

    downsample_rates = [1] + list(cfg.upsample_rates)[::-1][:-1]
    down_cum = list(np.cumprod(downsample_rates)[::-1])

    lvl_valid = mel_valid
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = leaky_relu(x, cfg.lrelu_slope)
        x = conv_transpose1d(p, f"ups.{i}", x, stride=u, padding=(k - u) // 2)
        if lvl_valid is not None:
            lvl_valid = lvl_valid * u
        if i == num_up - 1:
            x = jnp.pad(x, ((0, 0), (0, 0), (1, 0)), mode="reflect")
            if lvl_valid is not None:
                lvl_valid = lvl_valid + 1
        m = None if lvl_valid is None else vmask(x.shape[-1], lvl_valid)
        if m is not None:
            x = x * m

        du = int(down_cum[i])
        if du == 1:
            si = conv1d(p, f"source_downs.{i}", x=s_stft, ctx=ctx)
        else:
            si = conv1d(p, f"source_downs.{i}", s_stft, stride=du, padding=du // 2, ctx=ctx)
        if m is not None:
            si = si * m[:, :, : si.shape[-1]]
        si = resblock(p, f"source_resblocks.{i}", si,
                      cfg.source_resblock_kernel_sizes[i],
                      cfg.source_resblock_dilation_sizes[i], ctx,
                      mask=None if m is None else m[:, :, : si.shape[-1]],
                      gemm=gemm)
        x = x + si

        xs = None
        for j in range(nk):
            r = resblock(p, f"resblocks.{i * nk + j}", x,
                         cfg.resblock_kernel_sizes[j], cfg.resblock_dilation_sizes[j], ctx,
                         mask=m, gemm=gemm)
            xs = r if xs is None else xs + r
        x = xs / nk

    x = leaky_relu(x)  # default slope (generator.py:545 uses F.leaky_relu w/o slope)
    x = conv_s1(p, "conv_post", x, padding=3, ctx=ctx)
    magnitude = jnp.exp(x[:, : n_fft // 2 + 1, :])
    magnitude = jnp.minimum(magnitude, 1e2)
    phase = jnp.sin(x[:, n_fft // 2 + 1 :, :])

    wav = istft(magnitude * jnp.cos(phase), magnitude * jnp.sin(phase), n_fft, hop,
                valid_frames=None if lvl_valid is None else lvl_valid)
    return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)


def hift_inference(
    p: P,
    cfg: HiFTConfig,
    rng: jax.Array,
    mel: jax.Array,  # (B, 80, T)
    cache_source: Optional[jax.Array] = None,  # (B, 1, L_cache) streaming source carry
    mel_valid=None,  # traced scalar: true mel frames (bucket-padded serving)
) -> Tuple[jax.Array, jax.Array]:
    """mel -> (wav, source) (generator.py:570-582).

    ``mel_valid``: the length-masked serving bucket — ``mel`` is zero beyond
    it, and ``wav[:, :mel_valid * 256]`` equals the unpadded program's output
    (masked convs throughout; the sine source's noise draw differs in shape,
    which is distribution-preserving).  The source's end carries the stft
    reflect pad the unpadded program would see at its signal boundary."""
    up_total = int(np.prod(cfg.upsample_rates)) * cfg.istft_hop_len
    f0 = f0_predict(p.sub("f0_predictor"), mel, mel_valid=mel_valid)
    # nearest-neighbor upsample by up_total (torch nn.Upsample default mode)
    f0_up = (
        jnp.broadcast_to(f0[:, None, :, None], (f0.shape[0], 1, f0.shape[1], up_total))
        .reshape(f0.shape[0], 1, -1)
    )
    s = sine_source(p.sub("m_source"), cfg, rng, f0_up)
    if mel_valid is not None:
        L = s.shape[-1]
        Lv = mel_valid * up_total
        s = s * (jnp.arange(L)[None, None, :] < Lv).astype(s.dtype)
        # reproduce stft_center's end reflect pad at the TRUE boundary: the
        # unpadded program's tail frames window reflect(s[Lv-pad:Lv]); write
        # it into the zeroed pad region so those frames match bit-for-bit
        pad = cfg.istft_n_fft // 2
        tail = jax.lax.dynamic_slice_in_dim(s, jnp.maximum(Lv - pad - 1, 0),
                                            pad + 1, axis=2)
        refl = jnp.flip(tail[:, :, :-1], axis=2)  # s[Lv-2], ..., s[Lv-pad-1]
        s_refl = jax.lax.dynamic_update_slice_in_dim(s, refl, Lv, axis=2)
        # at Lv == L the buffer IS the true boundary and stft_center's own
        # reflect pad applies; the dynamic update would clamp and corrupt
        s = jnp.where(Lv + pad <= L, s_refl, s)
    if cache_source is not None and cache_source.shape[2] != 0:
        Lc = cache_source.shape[2]
        s = s.at[:, :, :Lc].set(cache_source)
    wav = hift_decode(p, cfg, mel, s, mel_valid=mel_valid)
    return wav, s


# ---------------------------------------------------------------------------
# Initialization (torch module layout: generator.py:392-488)
# ---------------------------------------------------------------------------


def init_hift_params(key: jax.Array, cfg: HiFTConfig) -> Params:
    """Random init with the exact HiFTGenerator parameter names/shapes
    (weight-norm already folded, matching compat.fold_weight_norm output)."""
    from ..params import KeyGen, init_conv1d, init_conv_transpose1d, init_linear

    d: Params = {}
    kg = KeyGen(key)
    init_linear(kg(), d, "m_source.l_linear", cfg.nb_harmonics + 1, 1)
    init_conv1d(kg(), d, "conv_pre", cfg.in_channels, cfg.base_channels, 7)
    ch = cfg.base_channels
    nk = len(cfg.resblock_kernel_sizes)
    down_cum = list(np.cumprod([1] + list(cfg.upsample_rates)[::-1][:-1])[::-1])
    c = ch
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        init_conv_transpose1d(kg(), d, f"ups.{i}", ch // (2 ** i), ch // (2 ** (i + 1)), k)
        c = ch // (2 ** (i + 1))
        du = int(down_cum[i])
        init_conv1d(kg(), d, f"source_downs.{i}", cfg.istft_n_fft + 2, c,
                    1 if du == 1 else du * 2)
        sk = cfg.source_resblock_kernel_sizes[i]
        for j, _dl in enumerate(cfg.source_resblock_dilation_sizes[i]):
            init_conv1d(kg(), d, f"source_resblocks.{i}.convs1.{j}", c, c, sk)
            init_conv1d(kg(), d, f"source_resblocks.{i}.convs2.{j}", c, c, sk)
            d[f"source_resblocks.{i}.activations1.{j}.alpha"] = jnp.ones((c,))
            d[f"source_resblocks.{i}.activations2.{j}.alpha"] = jnp.ones((c,))
        for j in range(nk):
            kk = cfg.resblock_kernel_sizes[j]
            for l, _dl in enumerate(cfg.resblock_dilation_sizes[j]):
                init_conv1d(kg(), d, f"resblocks.{i * nk + j}.convs1.{l}", c, c, kk)
                init_conv1d(kg(), d, f"resblocks.{i * nk + j}.convs2.{l}", c, c, kk)
                d[f"resblocks.{i * nk + j}.activations1.{l}.alpha"] = jnp.ones((c,))
                d[f"resblocks.{i * nk + j}.activations2.{l}.alpha"] = jnp.ones((c,))
    init_conv1d(kg(), d, "conv_post", c, cfg.istft_n_fft + 2, 7)
    for i in range(5):
        init_conv1d(kg(), d, f"f0_predictor.condnet.{2 * i}",
                    cfg.in_channels if i == 0 else cfg.f0_predictor_cond_channels,
                    cfg.f0_predictor_cond_channels, 3)
    init_linear(kg(), d, "f0_predictor.classifier", cfg.f0_predictor_cond_channels, 1)
    return d
