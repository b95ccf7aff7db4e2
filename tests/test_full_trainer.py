"""FullTrainer: full-parameter training with ZeRO-2 optimizer-state sharding
on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from cosy_tpu.config import FlowConfig, EncoderConfig, EstimatorConfig
from cosy_tpu.ctx import Ctx
from cosy_tpu.models import flow as F
from cosy_tpu.params import P
from cosy_tpu.parallel import mesh as pmesh
from cosy_tpu.train.full_trainer import FullTrainer, zero2_sharding

FCFG = FlowConfig(
    input_size=16, output_size=8, spk_embed_dim=12, vocab_size=30,
    encoder=EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                          linear_units=24, num_blocks=1),
    estimator=EstimatorConfig(in_channels=32, out_channels=8, channels=(16, 16),
                              attention_head_dim=4, n_blocks=1, num_mid_blocks=1,
                              num_heads=2),
)


def test_full_param_training_with_zero2():
    mesh = pmesh.make_mesh()
    params = F.init_flow_params(jax.random.PRNGKey(0), FCFG)

    def loss_fn(params, rng, batch):
        loss = F.flow_forward_train(P(params), FCFG, rng, batch,
                                    Ctx(rng=rng, train=True), no_prompt=True)
        return loss, {}

    trainer = FullTrainer(loss_fn, params, optax.adamw(1e-3), mesh=mesh,
                          zero2=True, accum=2)

    # optimizer moments are actually sharded over dp for shardable leaves
    mv_leaves = [x for x in jax.tree.leaves(trainer.opt_state)
                 if hasattr(x, "sharding") and x.ndim >= 1 and x.shape[0] % 8 == 0
                 and x.shape[0] >= 8]
    assert mv_leaves, "expected shardable optimizer leaves"
    sharded = [x for x in mv_leaves if "dp" in str(x.sharding.spec)]
    assert len(sharded) > 0, "no optimizer state was sharded over dp"

    rng = np.random.default_rng(0)
    accum, B = 2, 8
    batch = {
        "speech_token": rng.integers(0, 30, (accum, B, 6)).astype(np.int32),
        "speech_token_len": np.full((accum, B), 6, np.int32),
        "speech_feat": (rng.standard_normal((accum, B, 12, 8)) * 2 - 6).astype(np.float32),
        "speech_feat_len": np.full((accum, B), 12, np.int32),
        "embedding": rng.standard_normal((accum, B, 12)).astype(np.float32),
    }
    losses = []
    for i in range(6):
        m = trainer.step(batch, jax.random.PRNGKey(42))  # fixed rng -> loss must fall
        assert np.isfinite(m["loss"])
        assert m["skipped"] == 0.0
        losses.append(m["loss"])
    assert losses[-1] < losses[0], losses


def _flow_batch(rng, accum=2, B=8):
    return {
        "speech_token": rng.integers(0, 30, (accum, B, 6)).astype(np.int32),
        "speech_token_len": np.full((accum, B), 6, np.int32),
        "speech_feat": (rng.standard_normal((accum, B, 12, 8)) * 2 - 6).astype(np.float32),
        "speech_feat_len": np.full((accum, B), 12, np.int32),
        "embedding": rng.standard_normal((accum, B, 12)).astype(np.float32),
    }


@pytest.mark.slow
def test_tensor_parallel_matches_replicated():
    """dp=2 x model=4: TP-sharded training must produce the same loss
    trajectory as the replicated dp=2 run (GSPMD sharding is layout, not
    numerics), with transformer matmuls actually split over `model`."""
    from cosy_tpu.parallel.tp import count_sharded

    def loss_fn(params, rng, batch):
        loss = F.flow_forward_train(P(params), FCFG, rng, batch,
                                    Ctx(rng=rng, train=True), no_prompt=True)
        return loss, {}

    batch = _flow_batch(np.random.default_rng(1))

    def run(mesh, tensor_parallel):
        # fresh init per run: the trainer's donated step buffers may alias
        # the ingested dict's arrays
        params0 = F.init_flow_params(jax.random.PRNGKey(0), FCFG)
        tr = FullTrainer(loss_fn, params0, optax.adamw(1e-3), mesh=mesh,
                         zero2=True, accum=2, tensor_parallel=tensor_parallel)
        if tensor_parallel:
            n = count_sharded(tr.params)
            assert n >= 8, f"expected model-split matmuls, got {n}"
        return [tr.step(batch, jax.random.PRNGKey(7))["loss"] for _ in range(3)]

    devices = jax.devices("cpu")[:8]
    l_tp = run(pmesh.make_mesh(dp=2, model=4, devices=devices), True)
    l_rep = run(pmesh.make_mesh(dp=2, model=1, devices=devices[:2]), False)
    np.testing.assert_allclose(l_tp, l_rep, rtol=2e-4, atol=2e-5)


def test_prompted_training_with_cross_sample_mel_bucket():
    """Strategy-5 cross-sample prompts: the collate pads cross_sample_mel to
    its OWN bucket (100 frames by default), which must broadcast cleanly
    against a different speech_feat length — this traced fine only when
    max_feat_len happened to equal the cross bucket (crash repro'd at 120)."""
    params = F.init_flow_params(jax.random.PRNGKey(0), FCFG)
    rng = jax.random.PRNGKey(1)
    B, T_tok, T_mel, T_cross = 2, 12, 120, 100  # T_mel != T_cross
    r = np.random.default_rng(0)
    batch = {
        "speech_token": jnp.asarray(r.integers(0, 30, (B, T_tok)), jnp.int32),
        "speech_token_len": jnp.full((B,), T_tok, jnp.int32),
        "speech_feat": jnp.asarray(r.standard_normal((B, T_mel, 8)), jnp.float32),
        "speech_feat_len": jnp.full((B,), T_mel, jnp.int32),
        "embedding": jnp.asarray(r.standard_normal((B, 12)), jnp.float32),
        "cross_sample_mel": jnp.asarray(r.standard_normal((B, T_cross, 8)), jnp.float32),
        "cross_sample_mel_len": jnp.asarray([80, 0], jnp.int32),
    }
    loss = jax.jit(lambda rr, b: F.flow_forward_train(
        P(params), FCFG, rr, b, Ctx(rng=rr, train=True),
        no_prompt=False, mel_norm=(-6.0, 2.0)))(rng, batch)
    assert np.isfinite(float(loss))
    # and the other broadcast direction (cross bucket longer than feat)
    batch["speech_feat"] = batch["speech_feat"][:, :64]
    batch["speech_feat_len"] = jnp.full((B,), 64, jnp.int32)
    loss2 = jax.jit(lambda rr, b: F.flow_forward_train(
        P(params), FCFG, rr, b, Ctx(rng=rr, train=True),
        no_prompt=False, mel_norm=(-6.0, 2.0)))(rng, batch)
    assert np.isfinite(float(loss2))
