"""kaldi_fbank parity against an independent torch transcription of
torchaudio.compliance.kaldi.fbank's algorithm (the reference frontend calls
exactly that: cosyvoice/cli/frontend.py:143-152 with num_mel_bins=80,
dither=0, sample_frequency=16000, waveform pre-scaled by 1<<15).

torchaudio itself is not installed in this image, so the oracle below is a
line-for-line torch reimplementation of the relevant defaults: snip_edges,
remove_dc_offset, preemphasis 0.97 (replicate pad), povey window
(hann^0.85 symmetric), round-to-power-of-two FFT, power spectrum, HTK-mel
triangular banks computed piecewise-linear in mel space over
[20 Hz, nyquist], log with float-eps floor.
"""

import numpy as np
import torch

from cosy_tpu.data.prepare import kaldi_fbank


def torch_kaldi_fbank(wav: np.ndarray, sr: int = 16000, n_mels: int = 80) -> np.ndarray:
    x = torch.from_numpy(wav).double() * 32768.0
    frame_len = int(sr * 0.025)
    frame_shift = int(sr * 0.010)
    n_frames = 1 + (len(x) - frame_len) // frame_shift
    frames = x.unfold(0, frame_len, frame_shift)[:n_frames].clone()
    frames = frames - frames.mean(dim=1, keepdim=True)
    padded = torch.nn.functional.pad(frames.unsqueeze(0), (1, 0), mode="replicate").squeeze(0)
    frames = frames - 0.97 * padded[:, :-1]
    win = torch.hann_window(frame_len, periodic=False, dtype=torch.double) ** 0.85
    frames = frames * win
    n_fft = 1 << (frame_len - 1).bit_length()
    power = torch.fft.rfft(frames, n=n_fft).abs() ** 2

    def mel(f):
        return 1127.0 * torch.log1p(torch.as_tensor(f, dtype=torch.double) / 700.0)

    pts = torch.linspace(float(mel(20.0)), float(mel(sr / 2)), n_mels + 2, dtype=torch.double)
    bins_mel = mel(torch.linspace(0, sr / 2, n_fft // 2 + 1, dtype=torch.double))
    lo, c, hi = pts[:-2, None], pts[1:-1, None], pts[2:, None]
    up = (bins_mel[None] - lo) / (c - lo)
    down = (hi - bins_mel[None]) / (hi - c)
    fb = torch.clamp(torch.minimum(up, down), min=0)
    mel_e = power @ fb.T
    return torch.log(torch.clamp(mel_e, min=1.19209290e-7)).float().numpy()


def test_kaldi_fbank_matches_torch_oracle():
    rng = np.random.default_rng(7)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ours = kaldi_fbank(wav)
    oracle = torch_kaldi_fbank(wav)
    assert ours.shape == oracle.shape == (98, 80)
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-4)


def test_preemphasis_attenuates_dc():
    # a near-DC ramp should carry ~20 dB less low-band energy than the same
    # pipeline without preemphasis would give; check the lowest mel bin of a
    # 50 Hz tone sits far below the bin of a 1 kHz tone of equal amplitude
    t = np.arange(16000) / 16000
    low = kaldi_fbank(np.sin(2 * np.pi * 50 * t).astype(np.float32))
    mid = kaldi_fbank(np.sin(2 * np.pi * 1000 * t).astype(np.float32))
    assert low[:, 0].mean() < mid.max(axis=1).mean()


def test_short_input_yields_empty():
    assert kaldi_fbank(np.zeros(100, np.float32)).shape == (0, 80)
