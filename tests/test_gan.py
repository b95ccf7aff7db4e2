"""HiFiGAN adversarial training tests: discriminators, losses, one full
disc+gen turn on a tiny vocoder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosy_tpu.params import P
from cosy_tpu.models import gan as G
from cosy_tpu.ops.f0 import extract_f0, interpolate_f0
from cosy_tpu.train.gan_trainer import HiFiGanTrainer

from test_pipeline import MODEL_CFG, init_hift_params


@pytest.mark.slow
def test_discriminator_shapes_and_fmap():
    params = G.init_discriminator_params(jax.random.PRNGKey(0))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 4096))
    y_hat = jax.random.normal(jax.random.PRNGKey(2), (2, 4096))
    rs, gs, fr, fg = G.multiple_discriminator(P(params), y, y_hat)
    assert len(rs) == len(gs) == 5 + 3  # MPD periods + MRD resolutions
    assert len(fr) == len(fg) == 8
    for r in rs:
        assert np.isfinite(np.asarray(r)).all()


def test_gan_losses_behave():
    params = G.init_discriminator_params(jax.random.PRNGKey(0))
    # 512 samples: the loss identities hold at any length, and the full
    # production-size discriminator forward is compute-bound on CPU — the
    # real-length path is exercised by the (slow-tier) trainer-turn tests
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
    rs, gs, fr, fg = G.multiple_discriminator(P(params), y, y)
    # identical inputs -> zero feature-match loss, equal adv terms
    assert float(G.feature_match_loss(fr, fg)) < 1e-5
    assert float(G.multi_mel_loss(y, y)) < 1e-6
    tpr = G.tpr_loss(rs, gs, tau=0.04)
    assert np.isfinite(float(tpr))


def test_dpo_loss():
    l, cr, rr = G.dpo_loss(
        jnp.asarray([-1.0, -2.0]), jnp.asarray([-3.0, -2.5]),
        jnp.asarray([-1.5, -2.2]), jnp.asarray([-2.5, -2.4]), beta=0.01)
    assert np.isfinite(float(l))
    # preferring chosen more than reference does -> loss below log(2)
    assert float(l) < np.log(2.0)


def test_f0_extraction_sine():
    sr, hop = 22050, 256
    t = np.arange(sr) / sr
    wav = 0.5 * np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    f0 = extract_f0(wav, sr, hop)
    voiced = f0[4:-4]
    assert (np.abs(voiced - 220.0) < 5.0).mean() > 0.9
    filled = interpolate_f0(f0)
    assert (filled > 0).all()


@pytest.mark.slow
def test_gan_trainer_one_turn():
    cfg = MODEL_CFG.hift
    gen_params = init_hift_params(jax.random.PRNGKey(0), cfg)
    disc_params = G.init_discriminator_params(jax.random.PRNGKey(1))
    trainer = HiFiGanTrainer(cfg, gen_params, disc_params)

    T = 8  # mel frames -> 8*256 = 2048 samples
    rng = np.random.default_rng(0)
    batch = {
        "speech": jnp.asarray(rng.uniform(-0.5, 0.5, (1, T * 256)).astype(np.float32)),
        "speech_feat": jnp.asarray((rng.standard_normal((1, T, 80)) * 2 - 6).astype(np.float32)),
        "pitch_feat": jnp.asarray(rng.uniform(100, 200, (1, T)).astype(np.float32)),
    }
    m = trainer.step(batch, jax.random.PRNGKey(2))
    for k, v in m.items():
        assert np.isfinite(v), (k, v)
    assert m["gen/loss_mel"] > 0
    assert m["disc/loss_disc"] > 0


@pytest.mark.slow
def test_gan_trainer_dp_mesh_matches_single():
    """dp=4 GAN training must produce the same losses/updates as the
    single-device run on the same global batch (the DDP arrangement the
    reference uses for HiFiGAN training)."""
    import jax as _jax
    from cosy_tpu.parallel import mesh as pmesh

    cfg = MODEL_CFG.hift
    T, B = 8, 4
    rng = np.random.default_rng(1)
    batch = {
        "speech": jnp.asarray(rng.uniform(-0.5, 0.5, (B, T * 256)).astype(np.float32)),
        "speech_feat": jnp.asarray((rng.standard_normal((B, T, 80)) * 2 - 6).astype(np.float32)),
        "pitch_feat": jnp.asarray(rng.uniform(100, 200, (B, T)).astype(np.float32)),
    }

    def run(mesh):
        trainer = HiFiGanTrainer(
            cfg, init_hift_params(jax.random.PRNGKey(0), cfg),
            G.init_discriminator_params(jax.random.PRNGKey(1)), mesh=mesh)
        return trainer.step(dict(batch), jax.random.PRNGKey(2))

    m_dp = run(pmesh.make_mesh(dp=4, devices=_jax.devices("cpu")[:4]))
    m_1 = run(None)
    for k in m_1:
        np.testing.assert_allclose(m_dp[k], m_1[k], rtol=2e-4, atol=2e-5)
