"""ASR TransformerDecoder / BiTransformerDecoder parity vs recorded torch
outputs (reference decoder.py:33-356)."""

import jax
import jax.numpy as jnp
import numpy as np

from cosy_tpu.layers.decoder import (DecoderConfig, bi_transformer_decoder_forward,
                                     init_bi_transformer_decoder,
                                     init_transformer_decoder,
                                     transformer_decoder_forward)
from cosy_tpu.params import P
from test_parity import load_golden, assert_close

CFG = DecoderConfig(vocab_size=30, encoder_output_size=16, attention_heads=2,
                    linear_units=24, num_blocks=2, dropout_rate=0.0,
                    positional_dropout_rate=0.0)


def test_transformer_decoder_parity():
    params, ins, outs = load_golden("asr_decoder")
    logits, olens = transformer_decoder_forward(
        P(params), CFG, jnp.asarray(ins["memory"]),
        jnp.asarray(ins["memory_len"], jnp.int32),
        jnp.asarray(ins["ys_in"], jnp.int32),
        jnp.asarray(ins["ys_len"], jnp.int32))
    # compare valid region only (padding rows see garbage embeddings on both
    # sides but torch masks them differently downstream)
    for b, n in enumerate(np.asarray(ins["ys_len"])):
        assert_close(logits[b, :n], outs["logits"][b, :n], name=f"logits[{b}]")
    np.testing.assert_array_equal(np.asarray(olens), np.asarray(ins["ys_len"]))


def test_bi_transformer_decoder_parity():
    params, ins, outs = load_golden("asr_bidecoder")
    l_x, r_x, _ = bi_transformer_decoder_forward(
        P(params), CFG, jnp.asarray(ins["memory"]),
        jnp.asarray(ins["memory_len"], jnp.int32),
        jnp.asarray(ins["ys_in"], jnp.int32),
        jnp.asarray(ins["ys_len"], jnp.int32),
        jnp.asarray(ins["r_ys_in"], jnp.int32), reverse_weight=0.3,
        r_num_blocks=1)
    for b, n in enumerate(np.asarray(ins["ys_len"])):
        assert_close(l_x[b, :n], outs["l_x"][b, :n], name=f"l_x[{b}]")
        assert_close(r_x[b, :n], outs["r_x"][b, :n], name=f"r_x[{b}]")


def test_init_shapes_match_torch():
    params, ins, outs = load_golden("asr_decoder")
    mine = init_transformer_decoder(jax.random.PRNGKey(0), CFG)
    got = {k: v.shape for k, v in mine.items()}
    want = {k: v.shape for k, v in params.items()}
    assert got == want

    bparams, _, _ = load_golden("asr_bidecoder")
    mine = init_bi_transformer_decoder(jax.random.PRNGKey(0), CFG, r_num_blocks=1)
    got = {k: v.shape for k, v in mine.items()}
    want = {k: v.shape for k, v in bparams.items()}
    assert got == want
