"""Tensor-parallel inference: llm_decode with TP-sharded params must produce
the same tokens as the replicated run (GSPMD sharding is layout, not
numerics).  This is the multi-chip serving path: sharding the LLM over the
`model` axis multiplies the per-token weight bandwidth, the bs=1 decode
bottleneck (PERF.md roofline).

f64 so reduction-order noise cannot flip a sampling decision.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cosy_tpu.config import EncoderConfig, LLMConfig, replace
from cosy_tpu.models import llm as L
from cosy_tpu.params import P
from cosy_tpu.parallel import mesh as pmesh
from cosy_tpu.parallel import tp


def _cfg():
    enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                        linear_units=24, num_blocks=2)
    return LLMConfig(
        text_encoder_input_size=16, llm_input_size=16, llm_output_size=16,
        text_token_size=40, speech_token_size=30, spk_embed_dim=12,
        text_encoder=replace(enc, static_chunk_size=1),
        llm=replace(enc, static_chunk_size=1, input_layer="linear_legacy"))


def test_tp_sharded_decode_matches_replicated():
    with jax.enable_x64(True):
        cfg = _cfg()
        params = L.init_llm_params(jax.random.PRNGKey(0), cfg)
        params = {k: v.astype(jnp.float64) for k, v in params.items()}
        prefix = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16), jnp.float64)
        rng = jax.random.PRNGKey(5)

        r_rep = L.llm_decode(P(params), cfg, rng, prefix, 6, jnp.asarray(2), 12)

        mesh = pmesh.make_mesh(dp=1, model=2, devices=jax.devices("cpu")[:2])
        p_tp = tp.shard_params(mesh, params)
        assert tp.count_sharded(p_tp) >= 4, tp.count_sharded(p_tp)

        fn = jax.jit(lambda p, r: L.llm_decode(
            P(p), cfg, r, prefix, 6, jnp.asarray(2), 12))
        r_tp = fn(p_tp, rng)

        np.testing.assert_array_equal(np.asarray(r_tp.tokens),
                                      np.asarray(r_rep.tokens))
        assert int(r_tp.length) == int(r_rep.length)


def test_tp_sharded_flow_inference_matches_replicated():
    """serve --tp also shards the flow estimator (the compute-bound half of
    token2wav): the solve with TP-sharded params must match the replicated
    run.  GSPMD layout only changes contraction order; the flow path
    computes in f32 internally (mel output), so the bound is f32
    reduction-order noise (~1e-5 abs on ~6-magnitude log-mel), not exact
    equality like the f64 decode tests above."""
    from cosy_tpu.config import EstimatorConfig, FlowConfig
    from cosy_tpu.models import flow as F

    with jax.enable_x64(True):
        enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                            linear_units=24, num_blocks=1)
        cfg = FlowConfig(
            input_size=16, output_size=80, spk_embed_dim=12, vocab_size=30,
            encoder=enc,
            estimator=EstimatorConfig(in_channels=320, out_channels=80,
                                      channels=(16, 16), attention_head_dim=4,
                                      n_blocks=1, num_mid_blocks=1,
                                      num_heads=2))
        params = F.init_flow_params(jax.random.PRNGKey(0), cfg)
        params = {k: v.astype(jnp.float64) for k, v in params.items()}
        tok = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
        spk = jax.random.normal(jax.random.PRNGKey(2), (1, 12), jnp.float64)
        rng = jax.random.PRNGKey(3)

        def run(p):
            return F.flow_inference(
                P(p), cfg, rng, tok, jnp.zeros((1, 0), jnp.int32),
                jnp.zeros((1, 0, 80), jnp.float64), spk, n_timesteps=4,
                finetuned_norm=True)

        r_rep = np.asarray(run(params))

        mesh = pmesh.make_mesh(dp=1, model=2, devices=jax.devices("cpu")[:2])
        p_tp = tp.shard_params(mesh, params)
        assert tp.count_sharded(p_tp) >= 4, tp.count_sharded(p_tp)
        r_tp = np.asarray(jax.jit(run)(p_tp))
        np.testing.assert_allclose(r_tp, r_rep, rtol=2e-4, atol=2e-4)


def test_tp_sharded_batch_decode_matches_replicated():
    """The serving batch decode must also be sharding-invariant."""
    with jax.enable_x64(True):
        cfg = _cfg()
        params = L.init_llm_params(jax.random.PRNGKey(0), cfg)
        params = {k: v.astype(jnp.float64) for k, v in params.items()}
        prefix = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 16), jnp.float64)
        valid = jnp.asarray([6, 4])
        mins = jnp.asarray([2, 2])
        rng = jax.random.PRNGKey(8)

        r_rep = L.llm_decode_batch(P(params), cfg, rng, prefix, valid, mins, 12)

        mesh = pmesh.make_mesh(dp=1, model=2, devices=jax.devices("cpu")[:2])
        p_tp = tp.shard_params(mesh, params)
        fn = jax.jit(lambda p, r: L.llm_decode_batch(
            P(p), cfg, r, prefix, valid, mins, 12))
        r_tp = fn(p_tp, rng)
        np.testing.assert_array_equal(np.asarray(r_tp.tokens),
                                      np.asarray(r_rep.tokens))
