"""Record golden outputs of an independent oracle for whisper's
log_mel_spectrogram(n_mels=128), the feature op feeding the S3 speech
tokenizer (reference cosyvoice/cli/frontend.py:131-141).

The whisper package is not installed in this image, so the oracle is an
independent reimplementation of the published algorithm, deliberately using
a *different* stack from cosy_tpu.data.prepare.whisper_log_mel:

  - torch.stft (center=True reflect pad, periodic hann 400, hop 160,
    return_complex) instead of numpy framing + rfft,
  - a float64 slaney mel filterbank written directly from the
    librosa.filters.mel(htk=False, norm='slaney') definition (independent
    of cosy_tpu.ops.audio.mel_filterbank),
  - magnitudes = |stft|^2 with the final frame dropped,
  - log10(clamp(mel, 1e-10)), max()-8 dynamic-range clamp, (x+4)/4.

Run: python tools/gen_whisper_golden.py   -> tests/goldens/whisper_mel.npz
"""

from __future__ import annotations

import math
import os

import numpy as np
import torch

N_FFT = 400
HOP = 160
SR = 16000


def slaney_mel_fb(n_mels: int = 128, n_fft: int = N_FFT, sr: int = SR) -> np.ndarray:
    """librosa.filters.mel(sr, n_fft, n_mels, htk=False, norm='slaney'),
    written from the documented formulas in float64."""

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        f_sp = 200.0 / 3.0
        m = f / f_sp
        min_log_hz = 1000.0
        logstep = math.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_hz / f_sp + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep,
                        m)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f_sp = 200.0 / 3.0
        f = m * f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = math.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        f)

    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2))
    fb = np.zeros((n_mels, 1 + n_fft // 2))
    for i in range(n_mels):
        lo, c, hi = pts[i], pts[i + 1], pts[i + 2]
        lower = (fft_freqs - lo) / (c - lo)
        upper = (hi - fft_freqs) / (hi - c)
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
        fb[i] *= 2.0 / (hi - lo)  # slaney norm
    return fb


def oracle_log_mel(wav: np.ndarray, n_mels: int = 128) -> np.ndarray:
    audio = torch.from_numpy(wav.astype(np.float32))
    window = torch.hann_window(N_FFT)  # periodic
    stft = torch.stft(audio, N_FFT, HOP, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2  # drop final frame
    fb = torch.from_numpy(slaney_mel_fb(n_mels).astype(np.float32))
    mel = fb @ magnitudes
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).numpy()


def waveforms() -> dict:
    rng = np.random.default_rng(20260821)
    t1 = np.arange(16000) / SR
    wavs = {
        # seeded broadband noise, exactly 1 s
        "noise_1s": (0.3 * rng.standard_normal(16000)).astype(np.float32),
        # linear chirp 80 Hz -> 7 kHz over 2.3 s + odd length (catches framing)
        "chirp_2p3s": (0.5 * np.sin(2 * np.pi * (80.0 + (7000.0 - 80.0) *
                       (np.arange(36807) / SR) / 2.3 / 2.0) * (np.arange(36807) / SR))
                       ).astype(np.float32),
        # speech-ish: f0 sweep harmonics with amplitude envelope + noise floor
        "harm_1s": ((np.sin(2 * np.pi * 180 * t1) + 0.5 * np.sin(2 * np.pi * 360 * t1)
                     + 0.25 * np.sin(2 * np.pi * 540 * t1))
                    * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t1))
                    + 0.01 * rng.standard_normal(16000)).astype(np.float32),
    }
    return wavs


def main():
    out = {}
    for name, wav in waveforms().items():
        out[f"wav_{name}"] = wav
        out[f"mel_{name}"] = oracle_log_mel(wav)
        print(name, wav.shape, "->", out[f"mel_{name}"].shape,
              "range", float(out[f"mel_{name}"].min()), float(out[f"mel_{name}"].max()))
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens", "whisper_mel.npz")
    np.savez_compressed(os.path.abspath(path), **out)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
