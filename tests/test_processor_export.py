"""Processor-chain pipeline + export tool tests."""

import os

import numpy as np
import jax
import pytest

from cosy_tpu.data import processor as Pr
from cosy_tpu.export import average_checkpoints, export_stablehlo, find_checkpoints


def _fake_utts(n=12, sr=22050):
    rng = np.random.default_rng(0)
    for i in range(n):
        dur = rng.integers(sr // 2, sr)
        yield {
            "utt": f"u{i}",
            "speech": (0.3 * np.sin(2 * np.pi * 200 * np.arange(dur) / sr)).astype(np.float32),
            "sample_rate": sr,
            "speech_token": rng.integers(0, 100, rng.integers(10, 30)).tolist(),
            "text_token": rng.integers(0, 50, rng.integers(3, 10)).tolist(),
            "utt_embedding": rng.standard_normal(192).astype(np.float32),
        }


def test_processor_chain_gan_batches():
    pipe = Pr.build_pipeline(_fake_utts(), [
        (Pr.filter_stage, {}),
        (Pr.resample_stage, {"resample_rate": 22050}),
        (Pr.compute_fbank, {}),
        (Pr.compute_f0_stage, {}),
        (Pr.parse_embedding, {}),
        (Pr.shuffle_stage, {"shuffle_size": 8}),
        (Pr.sort_stage, {"sort_size": 4}),
        (Pr.dynamic_batch, {"max_frames_in_batch": 300}),
        (Pr.padding, {}),
    ])
    batches = list(pipe)
    assert batches
    for b in batches:
        B, T, C = b["speech_feat"].shape
        assert C == 80
        assert b["pitch_feat"].shape == (B, T)
        assert b["speech"].shape[0] == B
        assert (b["speech_feat_len"] <= T).all()
        # sorted descending inside batch (padding contract)
        assert (np.diff(b["speech_feat_len"]) <= 0).all()
        assert np.isfinite(b["speech_feat"]).all()


def test_shard_list():
    items = list(range(20))
    shards = [Pr.shard_list(items, 4, i) for i in range(4)]
    assert sorted(sum(shards, [])) == items
    workers = [Pr.shard_list(items, 2, 0, 2, w) for w in range(2)]
    assert sorted(sum(workers, [])) == items[0::2]


def test_average_checkpoints(tmp_path):
    import torch

    p1, p2 = str(tmp_path / "a.pt"), str(tmp_path / "b.pt")
    torch.save({"w": torch.ones(3)}, p1)
    torch.save({"w": torch.full((3,), 3.0)}, p2)
    avg = average_checkpoints([p1, p2], str(tmp_path / "avg.pt"))
    np.testing.assert_allclose(np.asarray(avg["w"]), 2.0)
    found = find_checkpoints(str(tmp_path / "*.pt"), num=2)
    assert len(found) == 2


def test_export_stablehlo_roundtrip(tmp_path):
    import jax.numpy as jnp

    def fn(w, x):
        return jnp.tanh(x @ w)

    w = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4)).astype(np.float32))
    path = export_stablehlo(fn, (w, x), str(tmp_path / "fn.stablehlo"))
    assert os.path.getsize(path) > 0


def test_padding_selects_spk_vs_utt_embedding():
    """Reference processor.py:430-433: use_spk_embedding=True conditions on
    the speaker-level embedding; False on the utterance-level one."""
    rng = np.random.default_rng(1)

    def utts():
        for i in range(4):
            yield {
                "utt": f"u{i}",
                "speech_feat": rng.standard_normal((10 + i, 80)).astype(np.float32),
                "utt_embedding": np.full(8, 1.0, np.float32),
                "spk_embedding": np.full(8, 2.0, np.float32),
            }

    for use_spk, expect_const in ((True, 2.0), (False, 1.0)):
        pipe = Pr.build_pipeline(utts(), [
            (Pr.parse_embedding, {"normalize": False}),
            (Pr.static_batch, {"batch_size": 4}),
            (Pr.padding, {"use_spk_embedding": use_spk}),
        ])
        (b,) = list(pipe)
        assert np.allclose(b["embedding"], expect_const), (use_spk, b["embedding"])


def test_padding_pitch_without_speech_feat():
    """compute_f0 without compute_fbank is a supported composition — padding
    must size the pitch block from the f0 lengths, not crash on a missing
    speech_feat."""
    rng = np.random.default_rng(2)

    def utts():
        for i in range(3):
            yield {"utt": f"u{i}",
                   "pitch_feat": rng.uniform(100, 200, 8 + i).astype(np.float32)}

    pipe = Pr.build_pipeline(utts(), [
        (Pr.static_batch, {"batch_size": 3}),
        (Pr.padding, {}),
    ])
    (b,) = list(pipe)
    assert b["pitch_feat"].shape == (3, 10)


def test_compute_fbank_bucketed_matches_exact():
    """The length-bucketed fbank (one XLA program per bucket instead of one
    per novel utterance length) is bit-identical to the unbucketed mel over
    the true frame count."""
    import jax.numpy as jnp

    from cosy_tpu.ops import audio as A

    rng = np.random.default_rng(3)
    for n in (11025, 12007, 22050):
        wav = rng.uniform(-0.5, 0.5, n).astype(np.float32)
        (out,) = list(Pr.compute_fbank(iter([{"speech": wav}])))
        ref = np.asarray(A.mel_spectrogram(jnp.asarray(wav[None])))[0].T
        assert out["speech_feat"].shape == ref.shape
        np.testing.assert_allclose(out["speech_feat"], ref, atol=1e-5, rtol=1e-5)
