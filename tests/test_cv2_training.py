"""CosyVoice2 training through the generic FullTrainer (the bin/train.py
path: full-parameter, dp + ZeRO-2)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from cosy_tpu.ctx import Ctx
from cosy_tpu.params import P
from cosy_tpu.parallel import mesh as pmesh
from cosy_tpu.train.full_trainer import FullTrainer
from cosy_tpu.models.qwen2lm import Qwen2LMConfig, qwen2lm_forward_train, init_qwen2lm_params
from cosy_tpu.layers.qwen2 import Qwen2Config

LCFG = Qwen2LMConfig(
    llm_input_size=32, llm_output_size=32, speech_token_size=30,
    qwen=Qwen2Config(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                     vocab_size=50))


def test_qwen2lm_full_training():
    mesh = pmesh.make_mesh()
    params = init_qwen2lm_params(jax.random.PRNGKey(0), LCFG)

    def loss_fn(params, rng, batch):
        res = qwen2lm_forward_train(P(params), LCFG, batch,
                                    Ctx(rng=rng, train=True), rng=rng)
        return res["loss"], {"acc": res["acc"]}

    trainer = FullTrainer(loss_fn, params, optax.adamw(1e-3), mesh=mesh,
                          zero2=True, accum=2)
    rng = np.random.default_rng(0)
    accum, B = 2, 8
    batch = {
        "text_token": rng.integers(0, 50, (accum, B, 5)).astype(np.int32),
        "text_token_len": np.full((accum, B), 5, np.int32),
        "speech_token": rng.integers(0, 30, (accum, B, 20)).astype(np.int32),
        "speech_token_len": np.full((accum, B), 20, np.int32),
    }
    losses = [trainer.step(batch, jax.random.PRNGKey(3))["loss"] for _ in range(5)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
