"""Audio op tests: STFT parity vs torch.stft golden; mel filterbank properties;
iSTFT round-trip; whisper log-mel vs recorded oracle golden."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from cosy_tpu.ops import audio as A

from test_parity import load_golden, assert_close


def test_stft_magnitude_matches_torch():
    _, ins, outs = load_golden("stft")
    wav = jnp.asarray(ins["wav"])  # (1, 2048)
    pad = (1024 - 256) // 2
    y = A.reflect_pad(wav, pad)
    mag = A.stft_magnitude(y, n_fft=1024, hop=256, win=1024)
    assert_close(mag, outs["mag"], atol=1e-3, rtol=1e-3, name="stft-mag")


def test_mel_filterbank_slaney_properties():
    fb = A.mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    # every filter is non-negative and has mass
    assert fb.min() >= 0.0
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: each filter integrates (w.r.t. Hz bin width) to ~2/width * area = 1
    df = 22050 / 2 / 512
    areas = fb.sum(axis=1) * df
    np.testing.assert_allclose(areas, 1.0, rtol=0.1)
    # filters beyond fmax are empty
    freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, freqs > 8000 + 50].max() == 0.0


def test_mel_spectrogram_shapes_and_range():
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 22050)).astype(np.float32))
    mel = A.mel_spectrogram(wav)
    assert mel.shape == (2, 80, A.num_mel_frames(22050))
    assert np.isfinite(np.asarray(mel)).all()
    assert mel.min() >= np.log(1e-5) - 1e-6


def test_istft_round_trip():
    """stft_center -> istft must reconstruct the interior of the signal."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 400)).astype(np.float32))
    s_re, s_im = A.stft_center(x, 16, 4)
    y = A.istft(s_re, s_im, 16, 4)
    n = min(x.shape[1], y.shape[1])
    np.testing.assert_allclose(np.asarray(y)[0, 8 : n - 8], np.asarray(x)[0, 8 : n - 8],
                               atol=1e-4, rtol=1e-4)


def test_whisper_log_mel_golden():
    """prepare.whisper_log_mel vs a recorded independent whisper oracle.

    The golden (tests/goldens/whisper_mel.npz, tools/gen_whisper_golden.py)
    reimplements whisper.log_mel_spectrogram(n_mels=128) — the op feeding the
    S3 speech tokenizer (reference cosyvoice/cli/frontend.py:131-141) — with
    torch.stft (center=True, periodic hann 400/160) and a float64 slaney
    filterbank, a fully independent stack from the numpy implementation under
    test.  Tolerance 1e-4 in the (log10+4)/4 domain: the oracle computes the
    mel matmul in float32 (as whisper does), ours in float64; observed
    max|err| is ~5e-5.
    """
    from cosy_tpu.data import prepare

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens", "whisper_mel.npz"))
    for name in ["noise_1s", "chirp_2p3s", "harm_1s"]:
        got = prepare.whisper_log_mel(np.asarray(g[f"wav_{name}"]))
        ref = np.asarray(g[f"mel_{name}"])
        assert got.shape == ref.shape, name
        assert np.abs(got - ref).max() < 1e-4, (name, np.abs(got - ref).max())
