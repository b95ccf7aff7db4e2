"""DPO training end-to-end: dataset fields -> batch composition -> preference
loss decreasing on synthetic pairs (reference: bin/train.py --dpo +
train_utils.batch_forward:238-274 + processor.py:422-429)."""

import numpy as np
import jax
import optax

from cosy_tpu.layers.qwen2 import Qwen2Config
from cosy_tpu.models.qwen2lm import Qwen2LMConfig, init_qwen2lm_params
from cosy_tpu.data.processor import filter_stage, padding
from cosy_tpu.parallel import mesh as pmesh
from cosy_tpu.train.dpo import make_dpo_loss_fn
from cosy_tpu.train.full_trainer import FullTrainer

LCFG = Qwen2LMConfig(
    llm_input_size=32, llm_output_size=32, speech_token_size=30,
    qwen=Qwen2Config(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                     vocab_size=50))


def test_processor_carries_reject_tokens():
    samples = [
        {"text_token": [1, 2, 3], "speech_token": [4, 5],
         "reject_speech_token": [7, 8, 9]},
        {"text_token": [1], "speech_token": [2],
         "reject_speech_token": []},  # dropped by filter (processor.py:101)
    ]
    kept = list(filter_stage(iter(samples)))
    assert len(kept) == 1
    out = next(padding(iter([kept])))
    assert out["reject_speech_token"].shape == (1, 3)
    assert out["reject_speech_token_len"].tolist() == [3]


def test_dpo_loss_decreases_on_synthetic_preferences():
    mesh = pmesh.make_mesh()
    key = jax.random.PRNGKey(0)
    policy = init_qwen2lm_params(key, LCFG)
    ref = jax.tree.map(np.copy, policy)  # frozen copy (bin/train.py:162-165)

    loss_fn = make_dpo_loss_fn(LCFG, ref, beta=0.1)
    trainer = FullTrainer(loss_fn, policy, optax.adamw(1e-3), mesh=mesh,
                          zero2=False, accum=2)

    rng = np.random.default_rng(0)
    accum, B, Tt, Ts = 2, 8, 5, 16
    # chosen continuations repeat token 3; rejected repeat token 7 and are
    # SHORTER — the reference's quirky IGNORE-mask logp average (llm.py:419-424)
    # only separates chosen from rejected via positions after the speech
    # region, which exist when the lengths differ (always true for real
    # preference data)
    batch = {
        "text_token": rng.integers(0, 50, (accum, B, Tt)).astype(np.int32),
        "text_token_len": np.full((accum, B), Tt, np.int32),
        "speech_token": np.full((accum, B, Ts), 3, np.int32),
        "speech_token_len": np.full((accum, B), Ts, np.int32),
        "reject_speech_token": np.full((accum, B, Ts), 7, np.int32),
        "reject_speech_token_len": np.full((accum, B), Ts - 6, np.int32),
    }
    ms = [trainer.step(batch, jax.random.PRNGKey(i)) for i in range(6)]
    assert all(np.isfinite(m["loss"]) for m in ms)
    # preference loss starts at -log sigmoid(0) = ln 2 and must drop as the
    # policy separates chosen from rejected
    assert abs(ms[0]["dpo_loss"] - np.log(2.0)) < 0.05, ms[0]
    assert ms[-1]["dpo_loss"] < ms[0]["dpo_loss"], [m["dpo_loss"] for m in ms]
    assert ms[-1]["chosen_reward"] > ms[-1]["reject_reward"]
    assert ms[-1]["dpo_acc"] >= 0.5
