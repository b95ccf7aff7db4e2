"""Pipeline parallelism (parallel/pp.py): the GPipe microbatch schedule over
the model mesh axis computes exactly the sequential transformer stack."""

import numpy as np
import jax
import jax.numpy as jnp

from cosy_tpu.config import EncoderConfig
from cosy_tpu.ctx import EVAL
from cosy_tpu.layers.conformer import encoder_forward
from cosy_tpu.models.llm import init_llm_params  # noqa: F401 (import check)
from cosy_tpu.params import P, KeyGen
from cosy_tpu.parallel import mesh as pmesh
from cosy_tpu.parallel.pp import (
    pipeline_encoder_forward, stack_layer_params,
)

CFG = EncoderConfig(
    input_size=16, output_size=16, attention_heads=2, linear_units=24,
    num_blocks=4, dropout_rate=0.0, positional_dropout_rate=0.0,
    attention_dropout_rate=0.0, input_layer="linear_legacy",
    static_chunk_size=1,
)


def _params():
    from cosy_tpu.layers.conformer import init_encoder

    params = {}
    init_encoder(KeyGen(jax.random.PRNGKey(0)), params, "", CFG, conformer=False)
    return params


def _inputs(B=4, T=6):
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.input_size))
    lens = jnp.asarray([T] * B, jnp.int32)
    return xs, lens


def test_stack_layer_params_shapes():
    params = _params()
    stacked = stack_layer_params(params, "encoders.", CFG.num_blocks)
    assert stacked["self_attn.linear_q.weight"].shape == (4, 16, 16)
    assert stacked["norm1.weight"].shape == (4, 16)


def test_pipeline_matches_sequential():
    params = _params()
    xs, lens = _inputs()
    want, _ = encoder_forward(P(params), CFG, xs, lens, EVAL, conformer=False)

    mesh = pmesh.make_mesh(dp=1, model=2, devices=jax.devices("cpu")[:2])
    got, _ = jax.jit(lambda p, x, l: pipeline_encoder_forward(
        p, CFG, x, l, mesh, n_micro=2))(params, xs, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_single_stage_and_four_micro():
    params = _params()
    xs, lens = _inputs(B=4)
    want, _ = encoder_forward(P(params), CFG, xs, lens, EVAL, conformer=False)
    mesh1 = pmesh.make_mesh(dp=1, model=1, devices=jax.devices("cpu")[:1])
    got1, _ = pipeline_encoder_forward(params, CFG, xs, lens, mesh1, n_micro=4)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    mesh4 = pmesh.make_mesh(dp=1, model=4, devices=jax.devices("cpu")[:4])
    got4, _ = pipeline_encoder_forward(params, CFG, xs, lens, mesh4, n_micro=2)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential():
    """Autodiff flows back through scan + ppermute: the reverse pipeline."""
    params = _params()
    xs, lens = _inputs()
    mesh = pmesh.make_mesh(dp=1, model=2, devices=jax.devices("cpu")[:2])

    def loss_seq(p):
        y, _ = encoder_forward(P(p), CFG, xs, lens, EVAL, conformer=False)
        return jnp.sum(jnp.square(y))

    def loss_pp(p):
        y, _ = pipeline_encoder_forward(p, CFG, xs, lens, mesh, n_micro=2)
        return jnp.sum(jnp.square(y))

    g_seq = jax.grad(loss_seq)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    for k in g_seq:
        np.testing.assert_allclose(np.asarray(g_pp[k]), np.asarray(g_seq[k]),
                                   atol=2e-4, rtol=2e-4, err_msg=k)


def test_pipeline_context_drives_llm_training_loss():
    """The real LLM training forward dispatches its 14-block (here 4-block)
    stack through the pipeline under pipeline_context, with identical loss."""
    from cosy_tpu.config import LLMConfig
    from cosy_tpu.ctx import Ctx
    from cosy_tpu.models.llm import init_llm_params, llm_forward_train
    from cosy_tpu.parallel.pp import pipeline_context
    from cosy_tpu.config import replace

    enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                        linear_units=24, num_blocks=2, dropout_rate=0.0,
                        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                        static_chunk_size=1)
    cfg = LLMConfig(
        text_encoder_input_size=16, llm_input_size=16, llm_output_size=16,
        text_token_size=40, speech_token_size=30, spk_embed_dim=12,
        text_encoder=enc,
        llm=replace(enc, num_blocks=4, input_layer="linear_legacy"),
    )
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "text_token": jnp.asarray(rng.integers(0, 40, (B, 5)), jnp.int32),
        "text_token_len": jnp.full((B,), 5, jnp.int32),
        "speech_token": jnp.asarray(rng.integers(0, 30, (B, 7)), jnp.int32),
        "speech_token_len": jnp.full((B,), 7, jnp.int32),
        "embedding": jnp.asarray(rng.standard_normal((B, 12)), jnp.float32),
    }
    ctx = Ctx(rng=jax.random.PRNGKey(1), train=True)
    want = llm_forward_train(P(params), cfg, batch, ctx)

    import cosy_tpu.parallel.pp as ppmod

    mesh = pmesh.make_mesh(dp=1, model=2, devices=jax.devices("cpu")[:2])
    before = getattr(ppmod._state, "engaged", 0)
    with pipeline_context(mesh, n_micro=2):
        got = jax.jit(lambda p, b: llm_forward_train(P(p), cfg, b,
                                                     ctx))(params, batch)
    assert getattr(ppmod._state, "engaged", 0) > before, \
        "pipeline did not engage - eligibility gate silently fell back"
    np.testing.assert_allclose(np.asarray(got["loss"]), np.asarray(want["loss"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["acc"]), np.asarray(want["acc"]),
                               atol=1e-5, rtol=1e-5)


def test_full_trainer_pipeline_parallel_flag():
    """FullTrainer(pipeline_parallel_microbatches=2) trains the LLM with the
    block stack pipelined over the model axis; loss matches the replicated
    trainer (blocks are dropout-free in this config)."""
    import optax

    from cosy_tpu.config import LLMConfig, replace
    from cosy_tpu.ctx import Ctx
    from cosy_tpu.models.llm import init_llm_params, llm_forward_train
    from cosy_tpu.train.full_trainer import FullTrainer

    enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                        linear_units=24, num_blocks=2, dropout_rate=0.0,
                        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                        static_chunk_size=1)
    cfg = LLMConfig(
        text_encoder_input_size=16, llm_input_size=16, llm_output_size=16,
        text_token_size=40, speech_token_size=30, spk_embed_dim=12,
        text_encoder=enc,
        llm=replace(enc, num_blocks=4, input_layer="linear_legacy"),
    )
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 4
    batch = {k: v[None] for k, v in {
        "text_token": rng.integers(0, 40, (B, 5)).astype(np.int32),
        "text_token_len": np.full((B,), 5, np.int32),
        "speech_token": rng.integers(0, 30, (B, 7)).astype(np.int32),
        "speech_token_len": np.full((B,), 7, np.int32),
        "embedding": rng.standard_normal((B, 12)).astype(np.float32),
    }.items()}

    def loss_fn(p, r, micro):
        out = llm_forward_train(P(p), cfg, micro, Ctx(rng=r, train=True))
        return out["loss"], {}

    def run(mesh, n_micro):
        fresh = {k: jnp.array(v) for k, v in params.items()}
        t = FullTrainer(loss_fn, fresh, optax.adamw(1e-3), mesh=mesh,
                        zero2=False, accum=1,
                        pipeline_parallel_microbatches=n_micro)
        return t.step(batch, jax.random.PRNGKey(5))["loss"]

    loss_rep = run(pmesh.make_mesh(dp=1, devices=jax.devices("cpu")[:1]), 0)
    loss_pp = run(pmesh.make_mesh(dp=1, model=2,
                                  devices=jax.devices("cpu")[:2]), 2)
    np.testing.assert_allclose(loss_pp, loss_rep, atol=1e-5, rtol=1e-5)
