"""Batched AR decode: per-sample streams must equal single-sample runs.

Run under f64: this CPU backend computes small batched fp32 matmuls through
a bf16 fastpath (B>=2 only), which is precision noise, not semantics — f64
avoids it so bit-exactness is assertable.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cosy_tpu.config import EncoderConfig, LLMConfig, replace
from cosy_tpu.models import llm as L
from cosy_tpu.params import P


def _cfg():
    enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                        linear_units=24, num_blocks=2)
    return LLMConfig(
        text_encoder_input_size=16, llm_input_size=16, llm_output_size=16,
        text_token_size=40, speech_token_size=30, spk_embed_dim=12,
        text_encoder=replace(enc, static_chunk_size=1),
        llm=replace(enc, static_chunk_size=1, input_layer="linear_legacy"))


def test_batch_decode_matches_singles_exactly():
    with jax.enable_x64(True):
        cfg = _cfg()
        p = L.init_llm_params(jax.random.PRNGKey(0), cfg)
        p = {k: v.astype(jnp.float64) for k, v in p.items()}
        rng = jax.random.PRNGKey(7)
        pe1 = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16), jnp.float64)
        pe2 = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16), jnp.float64)
        r1 = L.llm_decode(P(p), cfg, jax.random.fold_in(rng, 0), pe1, 7,
                          jnp.asarray(2), 12)
        r2 = L.llm_decode(P(p), cfg, jax.random.fold_in(rng, 1), pe2, 5,
                          jnp.asarray(3), 12)
        # left-pad the shorter prefix; per-sample rng is fold_in(rng, b)
        pb = jnp.concatenate([pe1, jnp.pad(pe2, ((0, 0), (2, 0), (0, 0)))], axis=0)
        rb = L.llm_decode_batch(P(p), cfg, rng, pb, jnp.asarray([7, 5]),
                                jnp.asarray([2, 3]), 12)
        np.testing.assert_array_equal(np.asarray(rb.tokens[0]), np.asarray(r1.tokens))
        np.testing.assert_array_equal(np.asarray(rb.tokens[1]), np.asarray(r2.tokens))
        assert int(rb.lengths[0]) == int(r1.length)
        assert int(rb.lengths[1]) == int(r2.length)


def test_batch_decode_eos_freezes_sample():
    cfg = _cfg()
    p = L.init_llm_params(jax.random.PRNGKey(3), cfg)
    pb = jax.random.normal(jax.random.PRNGKey(4), (3, 6, 16))
    # min_len 1 lets EOS come early for some sample eventually; just assert
    # valid structure (frozen rows stay -1-padded after their EOS)
    rb = L.llm_decode_batch(P(p), cfg, jax.random.PRNGKey(5), pb,
                            jnp.asarray([6, 4, 6]), jnp.asarray([1, 1, 1]), 16)
    toks = np.asarray(rb.tokens)
    for b in range(3):
        n = int(rb.lengths[b])
        assert 0 <= n <= 16
        assert np.all(toks[b, :n] >= 0) and np.all(toks[b, :n] < 30)
        assert np.all(toks[b, n:] == -1)


def test_batch_decode_int8_smoke():
    cfg = _cfg()
    p = L.init_llm_params(jax.random.PRNGKey(6), cfg)
    pb = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 16))
    rb = L.llm_decode_batch(P(p), cfg, jax.random.PRNGKey(8), pb,
                            jnp.asarray([5, 5]), jnp.asarray([2, 2]), 10,
                            int8_weights=True)
    assert np.all(np.asarray(rb.lengths) >= 2)


def test_qwen2lm_batch_decode_matches_singles():
    """CV2 batched decode (GQA + fill-token skip) vs per-sample runs, f64."""
    from cosy_tpu.layers.qwen2 import Qwen2Config
    from cosy_tpu.models.qwen2lm import (Qwen2LMConfig, init_qwen2lm_params,
                                         qwen2lm_decode, qwen2lm_decode_batch)

    with jax.enable_x64(True):
        cfg = Qwen2LMConfig(
            llm_input_size=32, llm_output_size=32, speech_token_size=30,
            qwen=Qwen2Config(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=2, head_dim=8, vocab_size=50))
        p = init_qwen2lm_params(jax.random.PRNGKey(0), cfg)
        p = {k: v.astype(jnp.float64) for k, v in p.items()}
        rng = jax.random.PRNGKey(9)
        pe1 = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32), jnp.float64)
        pe2 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32), jnp.float64)
        r1 = qwen2lm_decode(P(p), cfg, jax.random.fold_in(rng, 0), pe1,
                            jnp.asarray(2), 14)
        r2 = qwen2lm_decode(P(p), cfg, jax.random.fold_in(rng, 1), pe2,
                            jnp.asarray(3), 14)
        pb = jnp.concatenate([pe1, jnp.pad(pe2, ((0, 0), (2, 0), (0, 0)))], axis=0)
        rb = qwen2lm_decode_batch(P(p), cfg, rng, pb, jnp.asarray([6, 4]),
                                  jnp.asarray([2, 3]), 14)
        np.testing.assert_array_equal(np.asarray(rb.tokens[0]), np.asarray(r1.tokens))
        np.testing.assert_array_equal(np.asarray(rb.tokens[1]), np.asarray(r2.tokens))
        assert int(rb.lengths[0]) == int(r1.length)
        assert int(rb.lengths[1]) == int(r2.length)


def test_batch_decode_attend_width_exact():
    """attend_width W >= L0 + stop reads a narrower cache window but must be
    bit-identical to the full-width run — both one-shot and per-segment rungs."""
    with jax.enable_x64(True):
        cfg = _cfg()
        p = L.init_llm_params(jax.random.PRNGKey(0), cfg)
        p = {k: v.astype(jnp.float64) for k, v in p.items()}
        rng = jax.random.PRNGKey(11)
        pb = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 16), jnp.float64)
        valid = jnp.asarray([6, 4])
        mins = jnp.asarray([2, 2])
        full = L.llm_decode_batch(P(p), cfg, rng, pb, valid, mins, 12)

        # one-shot with W = L0 + max_len - 2 < S (exact: every key < W)
        narrow = L.llm_decode_batch(P(p), cfg, rng, pb, valid, mins, 12,
                                    stop_at=jnp.asarray(10), attend_width=16)
        np.testing.assert_array_equal(
            np.asarray(narrow.tokens[:, :10]), np.asarray(full.tokens[:, :10]))

        # segmented, one W rung per segment (W = L0 + stop of that segment)
        state = None
        for stop in (3, 7, 12):
            seg, state = L.llm_decode_batch(
                P(p), cfg, rng, pb, valid, mins, 12,
                stop_at=jnp.asarray(stop), state=state, return_state=True,
                attend_width=6 + stop)
        np.testing.assert_array_equal(np.asarray(seg.tokens), np.asarray(full.tokens))
        np.testing.assert_array_equal(np.asarray(seg.lengths), np.asarray(full.lengths))


def test_batch_decode_segments_match_uninterrupted():
    """Segment-wise batched decode (stop_at + state round-trip) must be
    bit-identical to one uninterrupted llm_decode_batch run."""
    with jax.enable_x64(True):
        cfg = _cfg()
        p = L.init_llm_params(jax.random.PRNGKey(0), cfg)
        p = {k: v.astype(jnp.float64) for k, v in p.items()}
        rng = jax.random.PRNGKey(9)
        pb = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 16), jnp.float64)
        valid = jnp.asarray([6, 4])
        mins = jnp.asarray([2, 2])
        full = L.llm_decode_batch(P(p), cfg, rng, pb, valid, mins, 12)

        state = None
        for stop in (3, 7, 12):
            seg, state = L.llm_decode_batch(
                P(p), cfg, rng, pb, valid, mins, 12,
                stop_at=jnp.asarray(stop), state=state, return_state=True)
        np.testing.assert_array_equal(np.asarray(seg.tokens), np.asarray(full.tokens))
        np.testing.assert_array_equal(np.asarray(seg.lengths), np.asarray(full.lengths))
