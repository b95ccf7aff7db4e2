"""Trainer tests: scanned grad-accum step, dp sharding over the 8-device CPU
mesh, checkpoint save/resume, merged export."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosy_tpu.config import (
    ModelConfig, TrainConfig, FlowConfig, LLMConfig, EncoderConfig, EstimatorConfig,
    LoRAConfig, AntiLeakageConfig, replace,
)
from cosy_tpu.models import flow as F, llm as L
from cosy_tpu.parallel import mesh as pmesh
from cosy_tpu.train.trainer import JointTrainer

TINY_ENC = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                         linear_units=24, num_blocks=1)

MODEL_CFG = ModelConfig(
    llm=LLMConfig(
        text_encoder_input_size=16, llm_input_size=16, llm_output_size=16,
        text_token_size=40, speech_token_size=30, spk_embed_dim=12,
        text_encoder=replace(TINY_ENC, static_chunk_size=1),
        llm=replace(TINY_ENC, static_chunk_size=1, input_layer="linear_legacy"),
    ),
    flow=FlowConfig(
        input_size=16, output_size=8, spk_embed_dim=12, vocab_size=30,
        encoder=TINY_ENC,
        estimator=EstimatorConfig(in_channels=32, out_channels=8, channels=(16, 16),
                                  attention_head_dim=4, n_blocks=1, num_mid_blocks=1,
                                  num_heads=2),
    ),
)

TRAIN_CFG = TrainConfig(
    training_mode="joint", batch_size=8, accumulate_grad_batches=2,
    max_feat_len=16, learning_rate=1e-3, warmup_steps=2,
    llm_lora=LoRAConfig(r=2, alpha=4, dropout=0.0),
    flow_lora=LoRAConfig(r=2, alpha=4, dropout=0.0,
                         target_modules=("to_q", "to_k", "to_v", "w_1", "w_2")),
)


def synthetic_loader(n_batches=2, accum=2, B=8, seed=0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        batches.append({
            "text_token": rng.integers(0, 40, (accum, B, 5)).astype(np.int32),
            "text_token_len": np.full((accum, B), 5, np.int32),
            "speech_token": rng.integers(0, 30, (accum, B, 9)).astype(np.int32),
            "speech_token_len": np.full((accum, B), 9, np.int32),
            "speech_feat": (rng.standard_normal((accum, B, 16, 8)) * 2 - 6).astype(np.float32),
            "speech_feat_len": np.full((accum, B), 16, np.int32),
            "embedding": rng.standard_normal((accum, B, 12)).astype(np.float32),
        })
    return batches


def test_trainer_fit_checkpoint_merge(tmp_path):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    mesh = pmesh.make_mesh()
    assert mesh.shape["dp"] == 8

    llm_params = L.init_llm_params(jax.random.PRNGKey(1), MODEL_CFG.llm)
    flow_params = F.init_flow_params(jax.random.PRNGKey(2), MODEL_CFG.flow)

    trainer = JointTrainer(MODEL_CFG, TRAIN_CFG, llm_params, flow_params,
                           out_dir=str(tmp_path), mesh=mesh, total_steps=20)
    loader = synthetic_loader()
    state = trainer.fit(loader, max_epochs=2, log_every=1)

    assert state.step == 4
    assert len(trainer._metrics_log) == 4
    for m in trainer._metrics_log:
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
    # grads actually flowed
    assert trainer._metrics_log[0]["grad_norm"] > 0

    # last checkpoint exists; resume restores step
    last = os.path.join(str(tmp_path), "joint_joint_last.ckpt.npz")
    assert os.path.exists(last)
    state2 = trainer.init_state(jax.random.PRNGKey(9))
    state2 = trainer.load_checkpoint(last, state2)
    assert state2.step == state.step
    a = jax.tree.leaves(state.loras)[0]
    b = jax.tree.leaves(state2.loras)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # merged export writes torch-format checkpoints
    merged = trainer.export_merged(state, save=True)
    assert "llm" in merged and "flow" in merged
    assert os.path.exists(os.path.join(str(tmp_path), "llm_merged_joint.pt"))
    assert os.path.exists(os.path.join(str(tmp_path), "flow_merged_joint.pt"))
    # merged keys are original-format (no lora_, no original_layer)
    for k in merged["flow"]:
        assert "lora_" not in k and "original_layer" not in k


def test_trainer_flow_only_mode(tmp_path):
    tcfg = replace(TRAIN_CFG, training_mode="flow_only")
    mesh = pmesh.make_mesh()
    flow_params = F.init_flow_params(jax.random.PRNGKey(2), MODEL_CFG.flow)
    trainer = JointTrainer(MODEL_CFG, tcfg, {}, flow_params,
                           out_dir=str(tmp_path), mesh=mesh, total_steps=20)
    loader = synthetic_loader(n_batches=1)
    state = trainer.fit(loader, max_epochs=1, log_every=1)
    assert "flow" in state.loras and "llm" not in state.loras
    assert all("llm_loss" not in m for m in trainer._metrics_log)


@pytest.mark.slow
def test_prng_impl_rbg_and_threefry(tmp_path):
    """TrainConfig.prng_impl selects the key implementation for the whole
    training stream (ctx.root_key).  "rbg" (TPU hardware RNG, the default —
    threefry dropout-bit generation measured at ~40% of the 300M joint step)
    and "threefry2x32" must both drive a dropout-enabled joint step to a
    finite decreasing loss; the two streams differ (distribution parity, not
    bit parity — same contract as vs the torch reference)."""
    from cosy_tpu.ctx import root_key

    losses = {}
    for impl in ("rbg", "threefry2x32"):
        tcfg = replace(
            TRAIN_CFG, prng_impl=impl,
            llm_lora=replace(TRAIN_CFG.llm_lora, dropout=0.1),
            flow_lora=replace(TRAIN_CFG.flow_lora, dropout=0.1),
        )
        mesh = pmesh.make_mesh()
        llm_params = L.init_llm_params(jax.random.PRNGKey(1), MODEL_CFG.llm)
        flow_params = F.init_flow_params(jax.random.PRNGKey(2), MODEL_CFG.flow)
        trainer = JointTrainer(MODEL_CFG, tcfg, llm_params, flow_params,
                               out_dir=str(tmp_path / impl), mesh=mesh,
                               total_steps=20)
        state = trainer.init_state(root_key(3, impl))
        batch = synthetic_loader(n_batches=1)[0]
        m1 = trainer.step(state, batch, jax.random.fold_in(root_key(4, impl), 1))
        assert np.isfinite(float(m1["loss"])), (impl, m1)
        assert float(m1["grad_norm"]) > 0.0, (impl, m1)
        losses[impl] = float(m1["loss"])
    # same model/data, different streams: losses agree to the dropout-noise
    # scale but are not required (or expected) to be bitwise equal
    assert abs(losses["rbg"] - losses["threefry2x32"]) / losses["rbg"] < 0.2, losses


@pytest.mark.slow
def test_dp_sharding_matches_single_device(tmp_path):
    """The dp=8 mesh step (gradient psum over the mesh) must produce the same
    updated adapters as the identical step on a dp=1 mesh — the DDP-allreduce
    correctness property (train_utils.py:94-108 equivalent)."""
    llm_p = L.init_llm_params(jax.random.PRNGKey(1), MODEL_CFG.llm)
    flow_p = F.init_flow_params(jax.random.PRNGKey(2), MODEL_CFG.flow)
    batch = synthetic_loader(1)[0]

    results = []
    for dp in (1, 8):
        mesh = pmesh.make_mesh(dp=dp)
        trainer = JointTrainer(MODEL_CFG, TRAIN_CFG, llm_p, flow_p,
                               out_dir=str(tmp_path / f"dp{dp}"), mesh=mesh,
                               total_steps=10)
        state = trainer.init_state(jax.random.PRNGKey(3))
        trainer.step(state, batch, jax.random.PRNGKey(4))
        results.append(jax.tree.map(np.asarray, state.loras))

    flat1, _ = jax.tree_util.tree_flatten_with_path(results[0])
    flat8 = jax.tree_util.tree_leaves(results[1])
    for (path, a), b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5,
                                   err_msg=str(path))
