"""MeanFlow few-step distillation (train/distill.py).

Validates, in order of increasing integration:
1. the MeanFlow identity's sign convention against analytic fields where the
   average velocity u is known in closed form;
2. student-equals-teacher at init (zero-initialized time_mlp_s branch);
3. end-to-end distillation on a tiny topology: the distilled 1/2-step
   sampler approximates the teacher's 10-step CFG Euler solve far better
   than the undistilled student does.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosy_tpu.config import EncoderConfig, EstimatorConfig, FlowConfig
from cosy_tpu.ctx import Ctx, EVAL
from cosy_tpu.layers.unet import conditional_decoder
from cosy_tpu.models import flow as F
from cosy_tpu.params import P
from cosy_tpu.train import distill as D

FCFG = FlowConfig(
    input_size=16, output_size=8, spk_embed_dim=12, vocab_size=30,
    encoder=EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                          linear_units=24, num_blocks=1),
    estimator=EstimatorConfig(in_channels=32, out_channels=8, channels=(16, 16),
                              attention_head_dim=4, n_blocks=1,
                              num_mid_blocks=1, num_heads=2),
)


# ---------------------------------------------------------------------------
# 1. identity sign convention (this codebase: t=0 noise -> t=1 data)
# ---------------------------------------------------------------------------


def test_meanflow_identity_time_linear_field():
    """v(y, tau) = tau (spatially constant): u(y, t, s) = (t + s) / 2, so the
    regression target v + (s - t) * (d_y u . v + d_t u) must reproduce u."""
    def u_fn(y, t, s):
        return jnp.broadcast_to(((t + s) / 2.0)[:, None, None], y.shape)

    B, C, T = 3, 4, 6
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (B, C, T))
    t = jnp.asarray([0.1, 0.4, 0.8])
    s = jnp.asarray([0.3, 0.9, 0.8])  # includes an s == t anchor
    v = jnp.broadcast_to(t[:, None, None], y.shape)  # v(y_t, t) = t

    u, du = jax.jvp(u_fn, (y, t, s), (v, jnp.ones_like(t), jnp.zeros_like(s)))
    u_tgt = v + (s - t)[:, None, None] * du
    np.testing.assert_allclose(np.asarray(u_tgt), np.asarray(u), atol=1e-6)


def test_meanflow_identity_delta_data_field():
    """sigma = 0 delta-data OT path: v(y, t) = (x1 - y)/(1 - t) and the true
    average velocity u(y, t, s) = (x1 - y)/(1 - t) is s-independent (straight
    trajectories) — the target must equal u exactly."""
    key = jax.random.PRNGKey(1)
    x1 = jax.random.normal(key, (2, 4, 6))

    def u_fn(y, t, s):
        return (x1 - y) / (1.0 - t)[:, None, None]

    y = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 6))
    t = jnp.asarray([0.2, 0.6])
    s = jnp.asarray([0.7, 0.9])
    v = (x1 - y) / (1.0 - t)[:, None, None]

    u, du = jax.jvp(u_fn, (y, t, s), (v, jnp.ones_like(t), jnp.zeros_like(s)))
    u_tgt = v + (s - t)[:, None, None] * du
    np.testing.assert_allclose(np.asarray(u_tgt), np.asarray(u), atol=1e-5)


# ---------------------------------------------------------------------------
# 2. zero-init branch: student == teacher at init
# ---------------------------------------------------------------------------


def _tiny_flow_params(seed=1):
    return F.init_flow_params(jax.random.PRNGKey(seed), FCFG)


def test_branch_init_equals_teacher():
    params = _tiny_flow_params()
    branched = D.add_meanflow_time_branch(params, FCFG.estimator,
                                          jax.random.PRNGKey(3))
    B, C, T = 2, 8, 16
    key = jax.random.PRNGKey(4)
    y = jax.random.normal(key, (B, C, T))
    mu = jax.random.normal(jax.random.fold_in(key, 1), (B, C, T))
    spks = jax.random.normal(jax.random.fold_in(key, 2), (B, C))
    cond = jnp.zeros((B, C, T))
    t = jnp.asarray([0.3, 0.7])
    s = jnp.asarray([0.9, 0.7])

    ep = P(params, "decoder.estimator.")
    bp = P(branched, "decoder.estimator.")
    v = conditional_decoder(ep, FCFG.estimator, y, None, mu, t, spks, cond, EVAL)
    u0 = conditional_decoder(bp, FCFG.estimator, y, None, mu, t, spks, cond,
                             EVAL, s=s)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(u0))

    # and the branch params are the only additions
    extra = set(branched) - set(params)
    assert extra == {
        "decoder.estimator.time_mlp_s.linear_1.weight",
        "decoder.estimator.time_mlp_s.linear_1.bias",
        "decoder.estimator.time_mlp_s.linear_2.weight",
        "decoder.estimator.time_mlp_s.linear_2.bias",
    }


# ---------------------------------------------------------------------------
# 3. end-to-end distillation on a tiny topology
# ---------------------------------------------------------------------------


def _batch(B=4, Ttok=8, T=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "speech_token": rng.integers(0, 30, (B, Ttok)).astype(np.int32),
        "speech_token_len": np.full((B,), Ttok, np.int32),
        "speech_feat": (rng.standard_normal((B, T, 8)) * 2 - 6).astype(np.float32),
        "speech_feat_len": np.full((B,), T, np.int32),
        "embedding": rng.standard_normal((B, 12)).astype(np.float32),
    }


def _sample_setup(teacher, batch):
    """mu/spks/conds for the prompt-free sampling comparison (the same frozen
    encoder path both samplers share)."""
    mean, std = -6.0, 2.0
    token = jnp.asarray(batch["speech_token"])
    token_len = jnp.asarray(batch["speech_token_len"])
    T = batch["speech_feat"].shape[1]
    tp = P(teacher)
    spk = F.dense(tp, "spk_embed_affine_layer",
                  F._l2_normalize(jnp.asarray(batch["embedding"]), axis=1), EVAL)
    h = F.flow_encode(tp, FCFG, token, token_len, EVAL)
    h = F.length_regulator(tp.sub("length_regulator"), h,
                           jnp.asarray(batch["speech_feat_len"]), T,
                           FCFG.regulator_stages, EVAL)
    B = token.shape[0]
    conds = jnp.zeros((B, FCFG.output_size, T))
    return h.transpose(0, 2, 1), spk, conds


@pytest.mark.slow  # multi-minute quality A/B (150 distill steps); the
# cheap structural distill tests (identity, branch-init, wiring, streaming
# flag) stay in the default tier
def test_distillation_beats_undistilled_few_step():
    teacher = _tiny_flow_params()
    # amplify the time-dependence of the random teacher so its trajectories
    # are genuinely curved — a random-init field is nearly straight, leaving
    # the one-step sampler almost nothing to learn (measured: err_init
    # 0.125 -> distilled 0.11; with the curved field 0.28 -> 0.14)
    for k in list(teacher):
        if "time_mlp" in k:
            teacher[k] = teacher[k] * 6.0
    batch = _batch()
    mu, spk, conds = _sample_setup(teacher, batch)
    z = jax.random.normal(jax.random.PRNGKey(9), mu.shape)

    # reference: the teacher's production sampler (10-step CFG Euler)
    ref = F.cfm_solve_euler(P(teacher, "decoder.estimator."), FCFG, z, None,
                            mu, spk, conds, 10)

    def err(student_est, nfe):
        full = {**D.add_meanflow_time_branch(teacher, FCFG.estimator,
                                             jax.random.PRNGKey(3)),
                **student_est}
        out = F.cfm_solve_mean(P(full, "decoder.estimator."), FCFG, z, None,
                               mu, spk, conds, nfe)
        return float(jnp.sqrt(jnp.mean(jnp.square(out - ref))))

    distiller = D.FlowDistiller(FCFG, teacher, lr=1e-3, seed=0,
                                prng_impl="threefry2x32")
    state = distiller.init_state()
    err1_init = err(state.student, 1)
    err2_init = err(state.student, 2)

    batches = [_batch(seed=s) for s in range(8)]
    state = distiller.fit(batches, steps=150, log_every=75)

    # the distilled few-step samplers must land much closer to the teacher's
    # full solve than the undistilled average-velocity field does (measured
    # ~0.5x at 100+ steps; 0.75x is the flake-proof bound)
    err1 = err(state.student, 1)
    err2 = err(state.student, 2)
    assert err1 < 0.75 * err1_init, (err1_init, err1)
    assert err2 < 0.75 * err2_init, (err2_init, err2)


def test_flow_inference_meanflow_sampler_wiring():
    teacher = _tiny_flow_params()
    branched = D.add_meanflow_time_branch(teacher, FCFG.estimator,
                                          jax.random.PRNGKey(3))
    token = jnp.asarray(np.random.default_rng(0).integers(0, 30, (1, 10)),
                        jnp.int32)
    empty_tok = jnp.zeros((1, 0), jnp.int32)
    empty_feat = jnp.zeros((1, 0, 8), jnp.float32)
    spk = jnp.zeros((1, 12), jnp.float32)
    mel = F.flow_inference(P(branched), FCFG, jax.random.PRNGKey(5), token,
                           empty_tok, empty_feat, spk, sampler="meanflow",
                           finetuned_norm=True, mel_norm=(-6.0, 2.0))
    T_mel = int(10 / FCFG.input_frame_rate * 22050 / 256)
    assert mel.shape == (1, 8, T_mel)
    assert np.all(np.isfinite(np.asarray(mel)))


def test_pipeline_meanflow_synthesis():
    """Full pipeline (LLM decode -> distilled 2-step flow -> HiFT) with
    InferenceConfig.sampler='meanflow' — the serving wiring."""
    from test_api import MODEL_CFG
    from cosy_tpu.config import InferenceConfig, replace
    from cosy_tpu.infer.pipeline import TTSPipeline
    import cosy_tpu.models.llm as L
    from cosy_tpu.models.hift import init_hift_params

    key = jax.random.PRNGKey(0)
    flow_p = F.init_flow_params(jax.random.fold_in(key, 2), MODEL_CFG.flow)
    flow_p = D.add_meanflow_time_branch(flow_p, MODEL_CFG.flow.estimator,
                                        jax.random.fold_in(key, 7))
    pipe = TTSPipeline(
        MODEL_CFG,
        L.init_llm_params(jax.random.fold_in(key, 1), MODEL_CFG.llm),
        flow_p,
        init_hift_params(jax.random.fold_in(key, 3), MODEL_CFG.hift),
        replace(InferenceConfig(), sampler="meanflow", meanflow_steps=2),
        finetuned_norm=True,
    )
    ids = np.asarray([[5, 9, 2, 7, 1]], np.int32)
    spk = np.zeros((1, MODEL_CFG.llm.spk_embed_dim), np.float32)
    outs = list(pipe.synthesize(jax.random.PRNGKey(1), ids,
                                spk_embedding=spk, stream=False))
    wav = np.concatenate([o["tts_speech"] for o in outs], axis=1)
    assert wav.size > 0 and np.all(np.isfinite(wav))


# ---------------------------------------------------------------------------
# 4. CosyVoice2 (causal flow2) distillation
# ---------------------------------------------------------------------------


def _tiny_flow2():
    from cosy_tpu.models.flow2 import Flow2Config, init_flow2_params

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
    return cfg, init_flow2_params(jax.random.PRNGKey(0), cfg)


def _batch2(B=4, Ttok=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "speech_token": rng.integers(0, 40, (B, Ttok)).astype(np.int32),
        "speech_token_len": np.full((B,), Ttok, np.int32),
        "speech_feat": rng.standard_normal((B, Ttok * 2, 8)).astype(np.float32),
        "speech_feat_len": np.full((B,), Ttok * 2, np.int32),
        "embedding": rng.standard_normal((B, 12)).astype(np.float32),
    }


@pytest.mark.slow  # multi-minute quality A/B (CV2 twin of the above)
def test_flow2_distillation_and_meanflow_sampler():
    from cosy_tpu.models.flow2 import flow2_inference

    cfg, teacher = _tiny_flow2()
    for k in list(teacher):  # curved field, as in the v1 test
        if "time_mlp" in k:
            teacher[k] = teacher[k] * 6.0

    rng = np.random.default_rng(3)
    tok = jnp.asarray(rng.integers(0, 40, (1, 10)))
    empty_tok = jnp.zeros((1, 0), jnp.int32)
    empty_feat = jnp.zeros((1, 0, 8), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((1, 12)).astype(np.float32))

    ref = flow2_inference(P(teacher), cfg, tok, empty_tok, empty_feat, spk,
                          n_timesteps=10)

    def err(student_est, nfe):
        full = {**D.add_meanflow_time_branch(teacher, cfg.estimator,
                                             jax.random.PRNGKey(3)),
                **student_est}
        out = flow2_inference(P(full), cfg, tok, empty_tok, empty_feat, spk,
                              n_timesteps=nfe, sampler="meanflow")
        return float(jnp.sqrt(jnp.mean(jnp.square(out - ref))))

    distiller = D.FlowDistiller(cfg, teacher, family="cv2", lr=1e-3, seed=0,
                                prng_impl="threefry2x32")
    state = distiller.init_state()
    err1_init = err(state.student, 1)
    err2_init = err(state.student, 2)
    print("cv2 err init:", err1_init, err2_init)

    state = distiller.fit([_batch2(seed=s) for s in range(8)], steps=150,
                          log_every=75)
    err1 = err(state.student, 1)
    err2 = err(state.student, 2)
    print("cv2 err distilled:", err1, err2)
    assert err1 < 0.8 * err1_init, (err1_init, err1)
    assert err2 < 0.8 * err2_init, (err2_init, err2)


def test_flow2_distill_streaming_mode():
    """The CV2 distillation covers the chunked-causal (streaming) attention
    variant that pipeline2's streaming serving runs the student under:
    the streaming loss is finite and differs from the non-streaming one
    (different attention pattern), and FlowDistiller alternates the flag
    host-side (two cached programs, flow2_forward_train's contract)."""
    cfg, teacher = _tiny_flow2()
    distiller = D.FlowDistiller(cfg, teacher, family="cv2", lr=1e-3, seed=0,
                                prng_impl="threefry2x32")
    state = distiller.init_state()
    batch = {k: jnp.asarray(v) for k, v in _batch2(seed=1).items()}
    rng = jax.random.PRNGKey(5)
    l_ns = float(D.flow2_distill_loss(state.student, teacher, cfg, rng, batch,
                                      streaming=False))
    l_st = float(D.flow2_distill_loss(state.student, teacher, cfg, rng, batch,
                                      streaming=True))
    assert np.isfinite(l_ns) and np.isfinite(l_st)
    assert l_ns != l_st  # chunked-causal attention actually engaged
    # the distiller's step alternates the static flag per step
    l0 = distiller.step(state, batch)
    l1 = distiller.step(state, batch)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
