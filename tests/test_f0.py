"""F0 tracker validation against signals with known ground truth.

pyworld (the reference's extractor, processor.py compute_f0) is not in this
image, so trustworthiness for HiFiGAN training targets is established
against physical ground truth instead: harmonic complexes at known pitch,
time-varying pitch (vibrato/glide), octave-error traps, and unvoiced
noise/silence.  Tolerances reflect what HiFiGAN's f0 L1 loss needs
(cents-level accuracy on voiced frames, correct voiced/unvoiced gating).
"""

import numpy as np
import pytest

from cosy_tpu import native
from cosy_tpu.ops.f0 import _extract_f0_numpy, extract_f0, interpolate_f0

SR, HOP = 22050, 256


def harmonic(f0_hz, n_sec=1.0, n_harm=6, decay=0.7, sr=SR):
    """Speech-like harmonic stack; f0_hz is scalar or per-sample array."""
    n = int(n_sec * sr)
    f = np.broadcast_to(np.asarray(f0_hz, np.float64), (n,))
    phase = 2 * np.pi * np.cumsum(f) / sr
    x = sum((decay ** k) * np.sin((k + 1) * phase) for k in range(n_harm))
    return (x / np.max(np.abs(x))).astype(np.float32)


def cents(a, b):
    return 1200 * np.abs(np.log2(a / b))


@pytest.mark.parametrize("hz", [80.0, 120.0, 220.0, 350.0, 480.0])
def test_constant_pitch_accuracy(hz):
    f0 = extract_f0(harmonic(hz), SR, HOP)
    voiced = f0[4:-4]
    assert (voiced > 0).mean() > 0.95, f"{hz} Hz: undervoiced"
    err = cents(voiced[voiced > 0], hz)
    assert np.median(err) < 20, f"{hz} Hz: median {np.median(err):.1f} cents"


def test_octave_trap_strong_second_harmonic():
    # 2nd harmonic louder than the fundamental — naive peak-pickers jump an
    # octave; autocorrelation must stay at the true period.
    n = SR
    t = np.arange(n) / SR
    x = (0.4 * np.sin(2 * np.pi * 150 * t) + 1.0 * np.sin(2 * np.pi * 300 * t))
    f0 = extract_f0((x / np.abs(x).max()).astype(np.float32), SR, HOP)
    voiced = f0[4:-4]
    ok = cents(voiced[voiced > 0], 150.0) < 50
    assert ok.mean() > 0.9, f"octave errors: {1 - ok.mean():.0%}"


def test_glide_tracks_moving_pitch():
    n = SR
    f_true = np.linspace(120, 240, n)
    f0 = extract_f0(harmonic(f_true), SR, HOP)
    centers = np.minimum((np.arange(len(f0)) * HOP), n - 1)
    want = f_true[centers]
    voiced = f0[4:-4] > 0
    err = cents(f0[4:-4][voiced], want[4:-4][voiced])
    assert voiced.mean() > 0.9
    assert np.median(err) < 40, np.median(err)


def test_vibrato():
    n = SR
    t = np.arange(n) / SR
    f_true = 200 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))  # ±3% at 5 Hz
    f0 = extract_f0(harmonic(f_true), SR, HOP)
    centers = np.minimum((np.arange(len(f0)) * HOP), n - 1)
    voiced = f0[4:-4] > 0
    err = cents(f0[4:-4][voiced], f_true[centers][4:-4][voiced])
    assert np.median(err) < 40, np.median(err)


def test_unvoiced_noise_and_silence_gate_to_zero():
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(SR // 2).astype(np.float32)
    f0n = extract_f0(noise, SR, HOP)
    assert (f0n == 0).mean() > 0.8, "white noise mostly unvoiced"
    f0s = extract_f0(np.zeros(SR // 2, np.float32), SR, HOP)
    assert np.all(f0s == 0)


def test_voiced_unvoiced_segmentation():
    rng = np.random.default_rng(1)
    seg_v = harmonic(180.0, 0.5)
    seg_u = (0.05 * rng.standard_normal(SR // 2)).astype(np.float32)
    wav = np.concatenate([seg_u, seg_v, seg_u])
    f0 = extract_f0(wav, SR, HOP)
    n = len(seg_u) // HOP
    mid = f0[n + 4 : 2 * n - 4]
    assert (mid > 0).mean() > 0.9
    assert (f0[: n - 4] == 0).mean() > 0.7
    assert (f0[2 * n + 4 :] == 0).mean() > 0.7


def test_native_kernel_matches_numpy_oracle():
    """native/f0.cpp computes the same linear autocorrelation as the numpy
    rfft formulation; parity is tolerance-level (summation order differs)."""
    if native.f0_module() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    # voiced glide + noise floor + unvoiced noise + silence, 4 s total
    wav = np.concatenate([
        harmonic(np.linspace(100, 300, 2 * SR), 2.0) +
        0.01 * rng.standard_normal(2 * SR).astype(np.float32),
        (0.1 * rng.standard_normal(SR)).astype(np.float32),
        np.zeros(SR, np.float32),
    ])
    ref = _extract_f0_numpy(wav, SR, HOP)
    got = extract_f0(wav, SR, HOP)
    assert got.shape == ref.shape
    # voiced/unvoiced decisions may flip only on threshold-knife-edge frames
    assert ((got > 0) == (ref > 0)).mean() > 0.99
    both = (got > 0) & (ref > 0)
    rel = np.abs(got[both] - ref[both]) / ref[both]
    assert np.median(rel) < 1e-6 and (rel < 0.03).mean() > 0.99


def test_interpolate_fills_gaps_preserves_voiced():
    f0 = np.array([0, 0, 100, 0, 0, 120, 0, 0], np.float32)
    out = interpolate_f0(f0)
    assert np.all(out > 0)
    assert out[2] == 100 and out[5] == 120
    # gap between the two voiced anchors is a linear bridge
    assert 100 < out[3] < 120 and 100 < out[4] < 120
