"""F0 (pitch) extraction — host op for HiFiGAN training targets.

Reference behavior: cosyvoice/dataset/processor.py compute_f0 (pyworld
harvest/dio at the mel frame period, interpolated to the mel length).
pyworld is a C++ library and unavailable in this image; the tracker here is
a normalized-autocorrelation design with the same output contract: (T_mel,)
Hz values, 0 for unvoiced frames.  The hot path is the native C++ kernel
(native/f0.cpp, OpenMP over frames, ~100x the numpy loop); the numpy
implementation below is the exact-contract fallback and the parity oracle
(tests/test_f0.py).  Set COSY_TPU_NATIVE_F0=0 to force the fallback.
"""

from __future__ import annotations

import os

import numpy as np


def extract_f0(
    wav: np.ndarray,  # (T,) float32 at `sr`
    sr: int = 22050,
    hop: int = 256,
    fmin: float = 60.0,
    fmax: float = 500.0,
    threshold: float = 0.3,
) -> np.ndarray:
    """(n_frames,) f0 in Hz, n_frames = ceil(len(wav)/hop)."""
    if os.environ.get("COSY_TPU_NATIVE_F0", "1") != "0":
        from .. import native

        mod = native.f0_module()
        if mod is not None:
            n_frames = int(np.ceil(len(wav) / hop))
            out = np.zeros(n_frames, np.float32)
            mod.extract_f0(
                np.ascontiguousarray(wav, np.float32), out,
                int(sr), int(hop), float(fmin), float(fmax), float(threshold))
            return out
    return _extract_f0_numpy(wav, sr, hop, fmin, fmax, threshold)


def _extract_f0_numpy(
    wav: np.ndarray,
    sr: int = 22050,
    hop: int = 256,
    fmin: float = 60.0,
    fmax: float = 500.0,
    threshold: float = 0.3,
) -> np.ndarray:
    n_frames = int(np.ceil(len(wav) / hop))
    win = int(sr / fmin * 2)  # two periods of the lowest pitch
    pad = win // 2
    x = np.pad(wav.astype(np.float64), (pad, pad))
    lag_min = int(sr / fmax)
    lag_max = int(sr / fmin)

    f0 = np.zeros(n_frames, np.float32)
    for i in range(n_frames):
        c = i * hop + pad
        frame = x[c - pad : c - pad + win]
        frame = frame - frame.mean()
        energy = float(frame[: win - lag_max] @ frame[: win - lag_max])
        if energy < 1e-8:
            continue
        # normalized autocorrelation over the lag range via FFT
        n_fft = 1 << int(np.ceil(np.log2(2 * win)))
        spec = np.fft.rfft(frame, n_fft)
        ac = np.fft.irfft(spec * np.conj(spec))[: lag_max + 1]
        if ac[0] <= 0:
            continue
        acn = ac / ac[0]
        seg = acn[lag_min : lag_max + 1]
        k = int(np.argmax(seg)) + lag_min
        if acn[k] < threshold:
            continue
        # parabolic interpolation around the peak
        if 0 < k < lag_max:
            a, b, c2 = acn[k - 1], acn[k], acn[k + 1]
            denom = a - 2 * b + c2
            shift = 0.5 * (a - c2) / denom if abs(denom) > 1e-12 else 0.0
            k = k + float(np.clip(shift, -1, 1))
        f0[i] = sr / k
    return f0


def interpolate_f0(f0: np.ndarray) -> np.ndarray:
    """Linearly fill unvoiced gaps (processor.py compute_f0 interpolation)."""
    voiced = f0 > 0
    if not voiced.any():
        return f0
    idx = np.arange(len(f0))
    out = np.interp(idx, idx[voiced], f0[voiced]).astype(np.float32)
    return out
