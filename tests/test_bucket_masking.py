"""Length-masked serving buckets: bucket-padded programs must reproduce the
unpadded computation exactly (up to f32 reassociation noise) in the valid
region.

This is the TPU answer to per-length program compilation in serving: the
reference (torch, dynamic shapes) runs every utterance length through one
graph; XLA compiles one program PER SHAPE, so a serving path that sees
arbitrary final-chunk lengths would pay a fresh compile per novel length
(minutes through a remote runtime).  The bucketed programs take padded
inputs + a traced true length and mask every length-sensitive op:
convolutions (re-zeroed pads), GroupNorm statistics (valid-frames-only),
attention (key bias), interpolation (traced scale), and the iSTFT
window-square envelope.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosy_tpu.config import replace
from cosy_tpu.ctx import EVAL
from cosy_tpu.params import P
from cosy_tpu.models import flow as F
from cosy_tpu.models.hift import hift_decode, hift_inference, f0_predict, init_hift_params

from test_pipeline import MODEL_CFG

FLOW_CFG = MODEL_CFG.flow
HIFT_CFG = MODEL_CFG.hift


def _close(a, b, name, atol=2e-4, rtol=2e-4):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    err = np.max(np.abs(a - b) / (np.abs(b).max() + 1e-6))
    assert err < atol + rtol, f"{name}: rel err {err:.2e}"


@pytest.mark.parametrize("v,ov", [(7, 12), (20, 34), (40, 69), (64, 110)])
def test_interpolate_linear_valid_matches_unpadded(v, ov):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 64))
    ref = F.interpolate_linear(x[..., :v], ov)
    got = F.interpolate_linear_valid(x, 128, jnp.asarray(v), jnp.asarray(ov))
    _close(got[..., :ov], ref, "interp", atol=1e-5)
    assert np.all(np.asarray(got[..., ov:]) == 0)


@pytest.mark.parametrize("v", [12, 41, 64, 96])
def test_length_regulator_valid_matches_unpadded(v):
    cfg = FLOW_CFG
    p = P(F.init_flow_params(jax.random.PRNGKey(1), cfg))
    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, 128, cfg.output_size))
    mel_v = int(v / cfg.input_frame_rate * 22050 / 256)
    mel_b = int(128 / cfg.input_frame_rate * 22050 / 256)
    ref = F.length_regulator_inference(
        p.sub("length_regulator"), x2[:, :0], x2[:, :v], 0, mel_v,
        cfg.regulator_stages, cfg.input_frame_rate)
    got = F.length_regulator_inference_valid(
        p.sub("length_regulator"), x2, jnp.asarray(v), mel_b,
        jnp.asarray(mel_v), cfg.regulator_stages, cfg.input_frame_rate)
    _close(got[:, :mel_v], ref, f"regulator v={v}")
    assert np.all(np.asarray(got[:, mel_v:]) == 0)


@pytest.mark.parametrize("v", [30, 57])
def test_flow_encode_masked_matches_unpadded(v):
    cfg = FLOW_CFG
    p = P(F.init_flow_params(jax.random.PRNGKey(3), cfg))
    tok = jax.random.randint(jax.random.PRNGKey(4), (1, 96), 0, cfg.vocab_size)
    ref = F.flow_encode(p, cfg, tok[:, :v], jnp.asarray([v]), EVAL)
    got = F.flow_encode(p, cfg, tok, jnp.asarray([v]), EVAL)
    _close(got[:, :v], ref, f"flow_encode v={v}")


@pytest.mark.parametrize("v", [40, 62])
def test_cfm_solve_masked_matches_unpadded(v):
    """Bucket-padded Euler solve (mask + frames_valid GroupNorm statistics)
    equals the unpadded dense solve in the valid region, with GARBAGE in the
    pad region of every input."""
    cfg = FLOW_CFG
    p = P(F.init_flow_params(jax.random.PRNGKey(5), cfg)).sub("decoder.estimator")
    T, Tb = v, 96
    k = jax.random.PRNGKey(6)
    z = jax.random.normal(k, (1, 80, Tb))
    mu = jax.random.normal(jax.random.fold_in(k, 1), (1, 80, Tb))
    spk = jax.random.normal(jax.random.fold_in(k, 2), (1, 80))
    cond = jnp.zeros((1, 80, Tb))
    vmask = (jnp.arange(Tb) < v).astype(jnp.float32)[None, None, :]
    # unpadded reference: exact-length dense fast path (even T only)
    assert T % 2 == 0
    ref = F.cfm_solve_euler(p, cfg, z[:, :, :T], None, mu[:, :, :T], spk,
                            cond[:, :, :T], 4, EVAL)
    got = F.cfm_solve_euler(p, cfg, z, vmask, mu * vmask, spk, cond, 4, EVAL,
                            frames_valid=jnp.asarray(v))
    _close(got[:, :, :T], ref, f"cfm_solve v={v}")


@pytest.mark.parametrize("v", [10, 17])
def test_f0_predict_masked_matches_unpadded(v):
    p = P(init_hift_params(jax.random.PRNGKey(7), HIFT_CFG)).sub("f0_predictor")
    mel = jax.random.normal(jax.random.PRNGKey(8), (1, 80, 24))
    mel_m = mel * (jnp.arange(24) < v)[None, None, :]
    ref = f0_predict(p, mel[:, :, :v])
    got = f0_predict(p, mel_m, mel_valid=jnp.asarray(v))
    _close(got[:, :v], ref, f"f0 v={v}")


@pytest.mark.parametrize("v", [9, 16])
def test_hift_decode_masked_matches_unpadded(v):
    """Bucket-padded HiFT decode (masked convs, reflected source boundary,
    masked iSTFT envelope) equals the unpadded decode on the first
    v*256 samples."""
    cfg = HIFT_CFG
    p = P(init_hift_params(jax.random.PRNGKey(9), cfg))
    Tb = 24
    up_total = int(np.prod(cfg.upsample_rates)) * cfg.istft_hop_len
    mel = jax.random.normal(jax.random.PRNGKey(10), (1, 80, Tb))
    mel_m = mel * (jnp.arange(Tb) < v)[None, None, :]
    # deterministic comparison: take the source from an unpadded
    # hift_inference, then bucket-pad it with the reflected boundary the
    # masked program expects
    _, s_u = hift_inference(p, cfg, jax.random.PRNGKey(11), mel[:, :, :v])
    ref = hift_decode(p, cfg, mel[:, :, :v], s_u)
    Lv = v * up_total
    pad = cfg.istft_n_fft // 2
    s_pad = jnp.zeros((1, 1, Tb * up_total))
    s_pad = s_pad.at[:, :, :Lv].set(s_u)
    s_pad = s_pad.at[:, :, Lv:Lv + pad].set(jnp.flip(s_u[:, :, Lv - pad - 1:Lv - 1], axis=2))
    got = hift_decode(p, cfg, mel_m, s_pad, mel_valid=jnp.asarray(v))
    _close(got[:, :Lv], ref, f"hift v={v}")


@pytest.mark.parametrize("v", [9, 16])
def test_hift_inference_masked_runs_and_prefix_finite(v):
    """hift_inference(mel_valid=...) end-to-end: the noise draw shape differs
    from the unpadded program (distribution-preserving), so assert structure:
    finite valid region, exact-zero source beyond the reflected boundary."""
    cfg = HIFT_CFG
    p = P(init_hift_params(jax.random.PRNGKey(12), cfg))
    Tb, up_total = 24, int(np.prod(cfg.upsample_rates)) * cfg.istft_hop_len
    mel = jax.random.normal(jax.random.PRNGKey(13), (1, 80, Tb))
    mel_m = mel * (jnp.arange(Tb) < v)[None, None, :]
    wav, s = hift_inference(p, cfg, jax.random.PRNGKey(14), mel_m,
                            mel_valid=jnp.asarray(v))
    Lv = v * up_total
    pad = cfg.istft_n_fft // 2
    assert np.isfinite(np.asarray(wav[:, :Lv])).all()
    s = np.asarray(s)
    assert np.all(s[:, :, Lv + pad:] == 0)
    np.testing.assert_allclose(s[0, 0, Lv:Lv + pad],
                               s[0, 0, Lv - 2:Lv - pad - 2:-1], rtol=1e-6)


def test_pipeline_final_chunk_bucketed_one_program():
    """Streaming finals of DIFFERENT lengths share one compiled program
    (the whole point: no per-length compile stalls mid-stream), and the
    audio stays finite with the right length."""
    from test_pipeline import _build_pipeline
    from cosy_tpu.infer.pipeline import StreamState

    pipe = _build_pipeline()
    fr = pipe.cfg.flow.input_frame_rate
    spk = np.zeros((1, pipe.cfg.llm.spk_embed_dim), np.float32)
    r = np.random.default_rng(0)
    outs = []
    for i, n in enumerate([3, 5, 9]):  # three distinct final-window lengths
        st = StreamState(mel_overlap=np.zeros((1, 80, 0), np.float32))
        tok = r.integers(0, pipe.cfg.flow.vocab_size, (1, n)).astype(np.int32)
        wav, _ = pipe.token2wav(jax.random.PRNGKey(30 + i), tok, None, None,
                                spk, stream_state=st, finalize=True)
        mel2 = int(n / fr * 22050 / 256)
        assert wav.shape[1] == mel2 * 256
        assert np.isfinite(wav).all()
        outs.append(wav)
    # one (bucket, state-shape) program served all three lengths
    assert pipe._t2w_final_jit._cache_size() == 1


def test_pipeline_streaming_with_bucketed_final_matches_structure():
    """Full streaming synthesis with bucket_final on: same chunk count and
    chunk lengths as with it off (the final chunk's audio differs only by
    the noise draw, which is distribution-preserving)."""
    from test_pipeline import _build_pipeline
    from cosy_tpu.config import replace as cfg_replace

    pipe = _build_pipeline()
    text = np.random.default_rng(3).integers(0, 40, (1, 12)).astype(np.int32)
    on = list(pipe.synthesize(jax.random.PRNGKey(9), text, stream=True))
    pipe_off = _build_pipeline()
    pipe_off.icfg = cfg_replace(pipe_off.icfg, bucket_final=False)
    off = list(pipe_off.synthesize(jax.random.PRNGKey(9), text, stream=True))
    assert len(on) == len(off)
    for a, b in zip(on, off):
        assert a["tts_speech"].shape == b["tts_speech"].shape
    # non-final chunks ride the exact fused-stream path — identical audio
    for a, b in zip(on[:-1], off[:-1]):
        np.testing.assert_allclose(a["tts_speech"], b["tts_speech"], atol=1e-5)


@pytest.mark.parametrize("v_tok", [5, 14])
def test_flow2_inference_bucketed_matches_unpadded(v_tok):
    """CosyVoice2 bucketed flow (token_valid): EXACT vs the unpadded program
    including the noise — the fixed seeded buffer has the same prefix at
    every length (flow2 fixed_noise), the causal estimator's convs cannot
    leak pads, and attention key-masks them."""
    from test_pipeline2 import FCFG
    from cosy_tpu.models.flow2 import flow2_inference, init_flow2_params

    cfg = FCFG
    p = P(init_flow2_params(jax.random.PRNGKey(20), cfg))
    Tb = 32
    tok = jax.random.randint(jax.random.PRNGKey(21), (1, Tb), 0, cfg.vocab_size)
    spk = jax.random.normal(jax.random.PRNGKey(22), (1, cfg.spk_embed_dim))
    zt = jnp.zeros((1, 0), jnp.int32)
    zf = jnp.zeros((1, 0, 80))
    ref = flow2_inference(p, cfg, tok[:, :v_tok], zt, zf, spk,
                          streaming=False, finalize=True, n_timesteps=2)
    got = flow2_inference(p, cfg, tok, zt, zf, spk, streaming=False,
                          finalize=True, n_timesteps=2,
                          token_valid=jnp.asarray(v_tok))
    r = cfg.token_mel_ratio
    _close(got[:, :, :v_tok * r], ref[:, :, :v_tok * r], f"flow2 v={v_tok}")
    assert np.all(np.asarray(got[:, :, v_tok * r:]) == 0)


def test_pipeline2_final_chunk_bucketed_one_program():
    """CV2 streaming finals at different (length, offset) pairs share one
    compiled program.  The mel is bit-exact vs the unpadded program (fixed
    flow noise — pinned by test_flow2_inference_bucketed_matches_unpadded);
    the wav differs only by HiFT's shape-dependent sine/noise draw
    (distribution-preserving), so compare at noise tolerance."""
    from test_pipeline2 import _pipe
    from cosy_tpu.infer.pipeline2 import Stream2State
    from cosy_tpu.config import replace as cfg_replace

    pipe = _pipe()
    pipe_off = _pipe()
    pipe_off.icfg = cfg_replace(pipe_off.icfg, bucket_final=False)
    spk = np.zeros((1, pipe.fcfg.spk_embed_dim), np.float32)
    r = np.random.default_rng(7)
    # two (length, offset) pairs suffice: both land in the one bucketed
    # program while the unbucketed arm compiles per-shape (the expensive
    # part of this test); a third pair added no new geometry
    for i, (n, off) in enumerate([(6, 4), (11, 8)]):
        tok = r.integers(0, pipe.fcfg.vocab_size, (1, n)).astype(np.int32)
        k = jax.random.PRNGKey(50 + i)
        wav_b, _ = pipe.token2wav(k, tok, None, None, spk, token_offset=off,
                                  state=Stream2State(), finalize=True)
        wav_s, _ = pipe_off.token2wav(k, tok, None, None, spk,
                                      token_offset=off, state=Stream2State(),
                                      finalize=True)
        assert wav_b.shape == wav_s.shape, (n, off)
        np.testing.assert_allclose(wav_b, wav_s, atol=0.05,
                                   err_msg=f"n={n} off={off}")
    assert pipe._t2w_final_jit._cache_size() == 1


@pytest.mark.parametrize("v_tok", [4, 11])
def test_flow_inference_bucketed_prompt_free(v_tok):
    """flow_inference(token_valid=...): one program per bucket; valid mel is
    finite and the pad region is dropped by the caller.  Exactness of every
    masked stage is pinned by the tests above; the full program differs from
    the unpadded one only in the z-noise draw shape (distributional)."""
    cfg = FLOW_CFG
    p = P(F.init_flow_params(jax.random.PRNGKey(15), cfg))
    Tb = 16
    tok = jax.random.randint(jax.random.PRNGKey(16), (1, Tb), 0, cfg.vocab_size)
    tok = tok * (jnp.arange(Tb) < v_tok)[None, :]
    mel_v = int(v_tok / cfg.input_frame_rate * 22050 / 256)
    spk = jax.random.normal(jax.random.PRNGKey(17), (1, cfg.spk_embed_dim))
    feat = F.flow_inference(
        p, cfg, jax.random.PRNGKey(18), tok,
        jnp.zeros((1, 0), jnp.int32), jnp.zeros((1, 0, 80)), spk,
        n_timesteps=4, finetuned_norm=True,
        token_valid=jnp.asarray(v_tok), mel_valid=jnp.asarray(mel_v))
    assert feat.shape[2] == int(Tb / cfg.input_frame_rate * 22050 / 256)
    assert np.isfinite(np.asarray(feat[:, :, :mel_v])).all()
