"""CosyVoice2 component parity tests vs recorded goldens."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosy_tpu.config import EncoderConfig, EstimatorConfig, replace
from cosy_tpu.ctx import EVAL
from cosy_tpu.params import P
from cosy_tpu.layers.qwen2 import Qwen2Config, qwen2_forward, qwen2_layer, rms_norm
from cosy_tpu.layers.upsample_encoder import upsample_encoder_forward
from cosy_tpu.layers.unet import conditional_decoder
from cosy_tpu.models.qwen2lm import Qwen2LMConfig, qwen2lm_forward_train, qwen2lm_decode
from cosy_tpu.models.flow2 import Flow2Config, flow2_forward_train, flow2_inference, init_flow2_params

from test_parity import load_golden, assert_close

TINY_QWEN = Qwen2Config(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                        vocab_size=50)


def test_qwen2_forward_matches_hf():
    params, ins, outs = load_golden("qwen2")
    y = qwen2_forward(P(params), TINY_QWEN, jnp.asarray(ins["xs"]), jnp.asarray(ins["lens"]), EVAL)
    assert_close(y[0], outs["hidden"][0], atol=5e-4, rtol=5e-4, name="qwen2-s0")
    assert_close(y[1, :5], outs["hidden"][1, :5], atol=5e-4, rtol=5e-4, name="qwen2-s1")


def test_qwen2_kv_cache_step_matches_hf():
    params, ins, outs = load_golden("qwen2")
    p = P(params)
    q = TINY_QWEN
    S = 8
    k_buf = jnp.zeros((q.num_hidden_layers, 1, q.num_key_value_heads, S, q.head_dim))
    v_buf = jnp.zeros_like(k_buf)
    xs = jnp.asarray(ins["xs"][:1, :4])
    causal = jnp.arange(S)[None, :] <= jnp.arange(4)[:, None]
    bias = jnp.where(causal, 0.0, -1e10)[None]
    h = xs
    for i in range(q.num_hidden_layers):
        h, (kb, vb) = qwen2_layer(p.sub(f"layers.{i}"), q, h, jnp.arange(4), bias, EVAL,
                                  kv_cache=(k_buf[i], v_buf[i]), cache_index=0)
        k_buf = k_buf.at[i].set(kb)
        v_buf = v_buf.at[i].set(vb)
    y1 = rms_norm(p, "norm", h, q.rms_norm_eps)
    assert_close(y1, outs["step_prefix"], atol=5e-4, rtol=5e-4, name="prefill")

    x2 = jnp.asarray(ins["xs"][:1, 4:5])
    bias2 = jnp.where(jnp.arange(S)[None, None, :] <= 4, 0.0, -1e10)
    h = x2
    for i in range(q.num_hidden_layers):
        h, _ = qwen2_layer(p.sub(f"layers.{i}"), q, h, jnp.full((1,), 4), bias2, EVAL,
                           kv_cache=(k_buf[i], v_buf[i]), cache_index=4)
    y2 = rms_norm(p, "norm", h, q.rms_norm_eps)
    assert_close(y2, outs["step_next"], atol=5e-4, rtol=5e-4, name="step")


UP_CFG = EncoderConfig(input_size=512, output_size=512, attention_heads=8,
                       linear_units=64, num_blocks=1, dropout_rate=0.0,
                       positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                       macaron_style=False, use_cnn_module=False,
                       static_chunk_size=25, layer_norm_eps=1e-12)


def test_upsample_encoder():
    params, ins, outs = load_golden("upsample_encoder")
    y, _ = upsample_encoder_forward(P(params), UP_CFG, jnp.asarray(ins["x"]),
                                    jnp.asarray(ins["lens"]), EVAL, streaming=False)
    assert_close(y, outs["y"], atol=5e-4, rtol=5e-4, name="upsample")
    y_s, _ = upsample_encoder_forward(P(params), UP_CFG, jnp.asarray(ins["x"]),
                                      jnp.asarray(ins["lens"]), EVAL, streaming=True)
    assert_close(y_s, outs["y_stream"], atol=5e-4, rtol=5e-4, name="upsample-stream")


def test_upsample_encoder_context():
    params, ins, outs = load_golden("upsample_encoder")
    y, _ = upsample_encoder_forward(P(params), UP_CFG, jnp.asarray(ins["x"]),
                                    jnp.asarray(ins["lens"]), EVAL, streaming=False,
                                    context=jnp.asarray(ins["context"]))
    assert_close(y, outs["y_ctx"], atol=5e-4, rtol=5e-4, name="upsample-ctx")


CAUSAL_EST = EstimatorConfig(in_channels=24, out_channels=6, channels=(16, 16),
                             dropout=0.0, attention_head_dim=4, n_blocks=1,
                             num_mid_blocks=1, num_heads=2, act_fn="gelu")


def test_causal_decoder():
    params, ins, outs = load_golden("causal_decoder")
    args = (jnp.asarray(ins["x"]), jnp.asarray(ins["mask"]), jnp.asarray(ins["mu"]),
            jnp.asarray(ins["t"]), jnp.asarray(ins["spks"]), jnp.asarray(ins["cond"]))
    y = conditional_decoder(P(params), CAUSAL_EST, *args, EVAL, causal=True,
                            streaming=False, static_chunk_size=4)
    assert_close(y, outs["y"], atol=5e-4, rtol=5e-4, name="causal")
    y_s = conditional_decoder(P(params), CAUSAL_EST, *args, EVAL, causal=True,
                              streaming=True, static_chunk_size=4)
    assert_close(y_s, outs["y_stream"], atol=5e-4, rtol=5e-4, name="causal-stream")


def test_qwen2lm_unistream_loss():
    params, ins, outs = load_golden("qwen2lm_unistream")
    cfg = Qwen2LMConfig(llm_input_size=32, llm_output_size=32, speech_token_size=30,
                        qwen=TINY_QWEN)
    batch = {k: jnp.asarray(v) for k, v in ins.items()}
    res = qwen2lm_forward_train(P(params), cfg, batch, EVAL, rng=None)
    assert_close(res["loss"], outs["loss"], atol=1e-3, rtol=1e-3, name="qwen2lm-loss")
    assert_close(res["acc"], outs["acc"], name="qwen2lm-acc")


def test_qwen2lm_bistream_and_decode():
    params, ins, outs = load_golden("qwen2lm_unistream")
    cfg = Qwen2LMConfig(llm_input_size=32, llm_output_size=32, speech_token_size=30,
                        qwen=TINY_QWEN)
    # bistream path: speech/text ratio > 3 required
    batch = {
        "text_token": jnp.asarray(np.random.default_rng(0).integers(0, 50, (1, 7))),
        "text_token_len": jnp.asarray([7]),
        "speech_token": jnp.asarray(np.random.default_rng(1).integers(0, 30, (1, 25))),
        "speech_token_len": jnp.asarray([25]),
    }
    res = qwen2lm_forward_train(P(params), cfg, batch, EVAL, rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(res["loss"]))

    # decode from [sos, text, task]
    from cosy_tpu.layers.basic import embedding
    text_emb = embedding(P(params).sub("llm.model.model"), "embed_tokens",
                         batch["text_token"])
    prefix = jnp.concatenate([
        params["llm_embedding.weight"][0][None, None], text_emb,
        params["llm_embedding.weight"][1][None, None]], axis=1)
    out = qwen2lm_decode(P(params), cfg, jax.random.PRNGKey(3), prefix,
                         jnp.asarray(2), 24)
    n = int(out.length)
    assert 0 < n <= 24
    toks = np.asarray(out.tokens[:n])
    assert (toks >= 0).all() and (toks < 30).all()  # specials never stored


@pytest.mark.slow
def test_flow2_train_and_inference():
    cfg = Flow2Config(
        input_size=16, output_size=8, spk_embed_dim=12, vocab_size=40,
        encoder=EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                              linear_units=24, num_blocks=1, static_chunk_size=4),
        num_up_blocks=1,
        estimator=EstimatorConfig(in_channels=32, out_channels=8, channels=(12, 12),
                                  attention_head_dim=4, n_blocks=1, num_mid_blocks=1,
                                  num_heads=2),
        decoder_static_chunk_size=4,
    )
    params = init_flow2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, Ttok = 2, 8
    Tmel = Ttok * 2
    batch = {
        "speech_token": jnp.asarray(rng.integers(0, 40, (B, Ttok))),
        "speech_token_len": jnp.asarray([8, 6]),
        "speech_feat": jnp.asarray(rng.standard_normal((B, Tmel, 8)).astype(np.float32)),
        "speech_feat_len": jnp.asarray([16, 12]),
        "embedding": jnp.asarray(rng.standard_normal((B, 12)).astype(np.float32)),
    }
    for streaming in (False, True):
        loss = flow2_forward_train(P(params), cfg, jax.random.PRNGKey(1), batch,
                                   EVAL, streaming=streaming)
        assert np.isfinite(float(loss)), streaming

    tok = jnp.asarray(rng.integers(0, 40, (1, 10)))
    ptok = jnp.asarray(rng.integers(0, 40, (1, 4)))
    pfeat = jnp.asarray(rng.standard_normal((1, 8, 8)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((1, 12)).astype(np.float32))
    mel = flow2_inference(P(params), cfg, tok, ptok, pfeat, spk, n_timesteps=2)
    assert mel.shape == (1, 8, 10 * 2)  # token_mel_ratio 2, prompt region cut
    assert np.isfinite(np.asarray(mel)).all()
    # partial (non-finalized) chunk drops the lookahead tokens
    mel_p = flow2_inference(P(params), cfg, tok, ptok, pfeat, spk, n_timesteps=2,
                            finalize=False, streaming=True)
    assert mel_p.shape == (1, 8, (10 - cfg.pre_lookahead_len) * 2)


def test_qwen2lm_inference_bistream_streaming_text():
    """Streaming-text generator (llm.py:513-611): speech tokens arrive as
    text chunks do, with [5 text | 15 speech] interleaving and fill-token
    bookkeeping; terminates with a valid stream."""
    from cosy_tpu.models.qwen2lm import (qwen2lm_inference_bistream,
                                         init_qwen2lm_params)

    cfg = Qwen2LMConfig(llm_input_size=32, llm_output_size=32, speech_token_size=30,
                        qwen=TINY_QWEN)
    params = init_qwen2lm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    chunks = [rng.integers(0, 50, (1, n)).astype(np.int32) for n in (5, 5, 3)]
    toks = list(qwen2lm_inference_bistream(
        P(params), cfg, jax.random.PRNGKey(1), iter(chunks), max_tokens=60,
        capacity=256))
    assert len(toks) > 0
    assert all(0 <= t < 30 for t in toks)  # specials never yielded

    # with a speech prompt, the prompt interleaves before generation starts
    toks2 = list(qwen2lm_inference_bistream(
        P(params), cfg, jax.random.PRNGKey(2), iter(chunks),
        prompt_text=jnp.asarray(rng.integers(0, 50, (1, 4))),
        prompt_speech_token=jnp.asarray(rng.integers(0, 30, (1, 12))),
        max_tokens=60, capacity=256))
    assert all(0 <= t < 30 for t in toks2)


def test_bistream_capacity_overflow_raises():
    """Writes past the fixed KV capacity must fail loudly: a clamped
    dynamic_update_slice would overwrite earlier cache columns while RoPE
    positions keep advancing — silent garbage."""
    import pytest

    from cosy_tpu.models.qwen2lm import (qwen2lm_inference_bistream,
                                         init_qwen2lm_params)

    cfg = Qwen2LMConfig(llm_input_size=32, llm_output_size=32, speech_token_size=30,
                        qwen=TINY_QWEN)
    params = init_qwen2lm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    chunks = [rng.integers(0, 50, (1, 5)).astype(np.int32) for _ in range(8)]
    with pytest.raises(ValueError, match="capacity"):
        list(qwen2lm_inference_bistream(
            P(params), cfg, jax.random.PRNGKey(1), iter(chunks),
            max_tokens=1000, capacity=24))  # tiny capacity -> must overflow


def test_decode_first_token_never_fill():
    """Step 0 has no previous token to re-feed on a fill-token skip, so the
    prefill sample masks ids > eos — the first stored `last` is always a
    real speech token (or eos -> done)."""
    from cosy_tpu.models.qwen2lm import qwen2lm_decode, init_qwen2lm_params

    cfg = Qwen2LMConfig(llm_input_size=32, llm_output_size=32, speech_token_size=30,
                        qwen=TINY_QWEN)
    params = init_qwen2lm_params(jax.random.PRNGKey(0), cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32))
    eos = cfg.speech_token_size
    for seed in range(8):  # random init -> near-uniform logits: fills WOULD sample
        res, st = qwen2lm_decode(P(params), cfg, jax.random.PRNGKey(seed),
                                 prefix, jnp.asarray(0), 4, return_state=True)
        first_last = int(st[3])
        assert first_last <= eos, f"fill token fed at step 0 (seed {seed})"
