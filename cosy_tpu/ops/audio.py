"""Audio feature ops as fused XLA computations.

The mel frontend bit-matches the Matcha mel_spectrogram the pretrained
flow/HiFT models expect (reference: matcha/utils/audio.py:45-82, wired in via
the model-dir yaml feat_extractor):

    reflect-pad (n_fft - hop)/2 | hann STFT center=False | sqrt(re^2+im^2+1e-9)
    | slaney mel basis | ln(clamp(x, 1e-5))

Everything is jit-able: one fused XLA program per (batch, length) bucket, in
contrast to the reference's per-clip torch.stft on host (prepare_joint_data.py
:160-185).  The slaney-normalized mel filterbank is computed from the standard
formulas (librosa-compatible; librosa itself is not a dependency).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# CosyVoice-300M mel config (model-dir yaml; see SURVEY.md §5 config notes)
N_FFT = 1024
NUM_MELS = 80
SAMPLE_RATE = 22050
HOP_SIZE = 256
WIN_SIZE = 1024
FMIN = 0.0
FMAX = 8000.0


# ---------------------------------------------------------------------------
# Slaney mel filterbank (librosa.filters.mel(htk=False, norm='slaney'))
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    n_mels: int = NUM_MELS,
    fmin: float = FMIN,
    fmax: float = FMAX,
) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) slaney-normalized triangular filterbank."""
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT (torch.stft parity: center=False, onesided, hann)
# ---------------------------------------------------------------------------


def frame_signal(y: jax.Array, frame_len: int, hop: int) -> jax.Array:
    """(B, L) -> (B, n_frames, frame_len).

    When frame_len divides into hop-chunks the framing is pure
    reshape+slices (gathers of L*frame_len/hop elements are slow on TPU);
    otherwise falls back to gather."""
    B, L = y.shape
    n_frames = 1 + (L - frame_len) // hop
    if frame_len % hop == 0:
        R = frame_len // hop
        need = (n_frames + R - 1) * hop
        if need > L:
            y = jnp.pad(y, ((0, 0), (0, need - L)))
        nch = (n_frames + R - 1)
        ch = y[:, : nch * hop].reshape(B, nch, hop)
        return jnp.concatenate(
            [ch[:, r : r + n_frames] for r in range(R)], axis=-1)
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_len)[None, :]
    return y[:, idx]


def stft_magnitude(
    y: jax.Array,  # (B, L) pre-padded
    n_fft: int = N_FFT,
    hop: int = HOP_SIZE,
    win: int = WIN_SIZE,
    eps: float = 1e-9,
) -> jax.Array:
    """(B, F, T) magnitude spectrum, F = n_fft//2 + 1 (audio.py:57-77)."""
    window = jnp.asarray(np.hanning(win + 1)[:-1], jnp.float32)  # periodic hann
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop) * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (B, T, F)
    mag = jnp.sqrt(jnp.square(spec.real) + jnp.square(spec.imag) + eps)
    return mag.transpose(0, 2, 1)


def reflect_pad(y: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")


@functools.partial(jax.jit, static_argnames=("n_fft", "n_mels", "sr", "hop", "win"))
def mel_spectrogram(
    y: jax.Array,  # (B, L) waveform in [-1, 1]
    n_fft: int = N_FFT,
    n_mels: int = NUM_MELS,
    sr: int = SAMPLE_RATE,
    hop: int = HOP_SIZE,
    win: int = WIN_SIZE,
    fmin: float = FMIN,
    fmax: float = FMAX,
) -> jax.Array:
    """(B, n_mels, T) natural-log mel spectrogram — the exact features the
    pretrained flow/HiFT expect (audio.py:45-82)."""
    pad = (n_fft - hop) // 2
    y = reflect_pad(y, pad)
    mag = stft_magnitude(y, n_fft, hop, win)
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("mf,bft->bmt", basis, mag)
    return jnp.log(jnp.maximum(mel, 1e-5))


def num_mel_frames(n_samples: int, n_fft: int = N_FFT, hop: int = HOP_SIZE) -> int:
    padded = n_samples + 2 * ((n_fft - hop) // 2)
    return 1 + (padded - n_fft) // hop


@functools.partial(jax.jit, static_argnames=("n_fft", "n_mels", "sr", "hop", "win"))
def mel_spectrogram_prepadded(
    y: jax.Array,  # (B, L) waveform ALREADY reflect-padded by (n_fft-hop)//2
    n_fft: int = N_FFT,
    n_mels: int = NUM_MELS,
    sr: int = SAMPLE_RATE,
    hop: int = HOP_SIZE,
    win: int = WIN_SIZE,
    fmin: float = FMIN,
    fmax: float = FMAX,
) -> jax.Array:
    """mel_spectrogram minus the internal reflect pad: callers that bucket
    the waveform length (zero tail) must apply the reflect pad on the TRUE
    signal first, or the final frames read reflected zeros instead of the
    reflected signal end.  Frames fully inside the true padded span are then
    bit-identical to mel_spectrogram's."""
    mag = stft_magnitude(y, n_fft, hop, win)
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("mf,bft->bmt", basis, mag)
    return jnp.log(jnp.maximum(mel, 1e-5))


# ---------------------------------------------------------------------------
# iSTFT (HiFT head: n_fft 16, hop 4, centered — torch.istft parity)
# ---------------------------------------------------------------------------


def istft(
    real: jax.Array,  # (B, F, T)
    imag: jax.Array,
    n_fft: int,
    hop: int,
    valid_frames=None,  # traced scalar: only the first N frames are real
) -> jax.Array:
    """Inverse STFT with hann window and center=True semantics, matching
    torch.istft as used by HiFT (generator.py:512-518).

    Overlap-add with window-square normalization, then center-crop n_fft//2.

    ``valid_frames`` (traced): the length-masked serving variant — spectrum
    frames beyond it are zeroed and the window-square normalizer is built
    from the valid frames only, so samples < hop*(valid_frames-1) equal an
    unpadded istft over exactly ``valid_frames`` frames (the bucket-padded
    HiFT program needs this; see models.hift.hift_inference mel_valid).
    """
    B, F, T = real.shape
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], jnp.float32)
    fmask = None
    if valid_frames is not None:
        fmask = (jnp.arange(T) < valid_frames).astype(jnp.float32)
        real = real * fmask[None, None, :]
        imag = imag * fmask[None, None, :]
    # irfft as a real matmul (n_fft is 16 — two tiny constant DFT matrices);
    # complex dtypes are UNIMPLEMENTED on some TPU runtimes and the matmul
    # form is MXU-native anyway:
    # x[n] = (1/N) * sum_k w_k (Re X_k cos(2πkn/N) - Im X_k sin(2πkn/N)),
    # w_0 = w_{N/2} = 1, else 2.
    k = np.arange(F)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft  # (F, n_fft)
    w = np.full((F, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    C = jnp.asarray(w * np.cos(ang) / n_fft, jnp.float32)
    S = jnp.asarray(-w * np.sin(ang) / n_fft, jnp.float32)
    frames = (jnp.einsum("bft,fn->btn", real.astype(jnp.float32), C)
              + jnp.einsum("bft,fn->btn", imag.astype(jnp.float32), S))
    frames = frames * window[None, None, :]

    out_len = n_fft + hop * (T - 1)
    if n_fft % hop == 0:
        # scatter-free overlap-add: window chunks of size ``hop`` from R
        # consecutive frames land on each hop slot — R shifted pads + adds
        # (scatter is pathologically slow on TPU; this is pure slices)
        R = n_fft // hop
        fr = frames.reshape(B, T, R, hop)
        sig = jnp.zeros((B, T + R - 1, hop), jnp.float32)
        for r in range(R):
            sig = sig + jnp.pad(fr[:, :, r], ((0, 0), (r, R - 1 - r), (0, 0)))
        sig = sig.reshape(B, (T + R - 1) * hop)
        # window-square normalizer: constant for given (T, n_fft, hop) — or
        # built from the valid-frame mask on-device (tiny: (T+R-1, hop))
        w2np = np.square(np.hanning(n_fft + 1)[:-1]).reshape(R, hop)
        if fmask is None:
            ws = np.zeros((T + R - 1, hop), np.float64)
            for r in range(R):
                ws[r : r + T] += w2np[r]
            wsum = jnp.asarray(ws.reshape(-1), jnp.float32)
        else:
            w2 = jnp.asarray(w2np, jnp.float32)
            wsd = jnp.zeros((T + R - 1, hop), jnp.float32)
            for r in range(R):
                wsd = wsd + jnp.pad(fmask[:, None] * w2[r][None, :],
                                    ((r, R - 1 - r), (0, 0)))
            wsum = wsd.reshape(-1)
    else:
        assert fmask is None, "valid_frames requires n_fft % hop == 0"
        idx = (jnp.arange(T) * hop)[:, None] + jnp.arange(n_fft)[None, :]
        sig = jnp.zeros((B, out_len), jnp.float32)
        sig = sig.at[:, idx.reshape(-1)].add(frames.reshape(B, -1))
        wsum = jnp.zeros((out_len,), jnp.float32)
        wsum = wsum.at[idx.reshape(-1)].add(jnp.tile(jnp.square(window), (T,)))
    sig = sig / jnp.maximum(wsum, 1e-11)[None, :]
    crop = n_fft // 2
    return sig[:, crop : out_len - crop]


def stft_center(
    y: jax.Array,  # (B, L)
    n_fft: int,
    hop: int,
) -> tuple:
    """STFT with center=True reflect padding (torch.stft default), used for
    the HiFT source signal (generator.py:504-510).  Returns (real, imag),
    each (B, F, T) — the rFFT is two tiny constant matmuls (complex dtypes
    are UNIMPLEMENTED on some TPU runtimes; matmul is MXU-native)."""
    pad = n_fft // 2
    y = jnp.pad(y.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], jnp.float32)
    frames = frame_signal(y, n_fft, hop) * window[None, None, :]  # (B, T, n)
    F = n_fft // 2 + 1
    k = np.arange(F)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft
    C = jnp.asarray(np.cos(ang), jnp.float32)
    S = jnp.asarray(-np.sin(ang), jnp.float32)
    real = jnp.einsum("btn,fn->bft", frames, C)
    imag = jnp.einsum("btn,fn->bft", frames, S)
    return real, imag
