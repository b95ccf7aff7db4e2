"""MCD metric sanity: zero on identical input, monotone in perturbation,
alignment-invariant to time warping."""

import numpy as np

from cosy_tpu.ops.mcd import mcd, mel_to_cepstra


def _fake_log_mel(T=80, M=80, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 6, T)[:, None]
    f = np.linspace(0, 3, M)[None, :]
    return np.sin(t + f) + 0.1 * rng.standard_normal((T, M)) - 6.0


def test_identity_is_zero():
    x = _fake_log_mel()
    assert mcd(x, x) < 1e-9
    assert mcd(x, x, align=False) < 1e-9


def test_monotone_in_noise():
    x = _fake_log_mel()
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(x.shape)
    small = mcd(x, x + 0.05 * noise, align=False)
    big = mcd(x, x + 0.5 * noise, align=False)
    assert 0 < small < big


def test_dtw_absorbs_time_stretch():
    x = _fake_log_mel(T=80)
    # stretch by repeating every 4th frame (length 100)
    idx = np.sort(np.concatenate([np.arange(80), np.arange(0, 80, 4)]))
    stretched = x[idx]
    aligned = mcd(x, stretched, align=True)
    blunt = mcd(x, stretched, align=False)
    assert aligned < blunt
    assert aligned < 1.0, aligned  # same content, mostly absorbed


def test_cepstra_shape_and_energy_drop():
    x = _fake_log_mel()
    c = mel_to_cepstra(x, n_cep=13)
    assert c.shape == (80, 13)
    # adding a constant (pure energy) to the log-mel must not change c1..cK
    c2 = mel_to_cepstra(x + 3.0, n_cep=13)
    np.testing.assert_allclose(c, c2, atol=1e-9)
