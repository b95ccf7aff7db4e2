"""Full-parameter trainer checkpointing (orbax, sharded + async).

Reference behavior: rank-0 .pt save + step-restoring resume
(cosyvoice/utils/train_utils.py:195-214, bin/train.py:135-153).  Here:
every host writes its own dp/ZeRO-2 shards, saves run async (donation-safe:
the D2H copy completes before save returns), restore lands leaves on their
target shardings directly.
"""

import numpy as np
import jax
import optax

from cosy_tpu.ctx import Ctx
from cosy_tpu.models import flow as F
from cosy_tpu.params import P
from cosy_tpu.parallel import mesh as pmesh
from cosy_tpu.train.full_trainer import FullTrainer

from test_full_trainer import FCFG, _flow_batch


def _loss_fn(params, rng, batch):
    loss = F.flow_forward_train(P(params), FCFG, rng, batch,
                                Ctx(rng=rng, train=True), no_prompt=True)
    return loss, {}


def _trainer():
    mesh = pmesh.make_mesh()
    params = F.init_flow_params(jax.random.PRNGKey(0), FCFG)
    return FullTrainer(_loss_fn, params, optax.adamw(1e-3), mesh=mesh,
                       zero2=True, accum=2)


def test_save_resume_identical_trajectory(tmp_path):
    """Save at step 2 while training continues (async + donated buffers),
    restore into a FRESH trainer, and the resumed trajectory must equal the
    uninterrupted one exactly."""
    rng = np.random.default_rng(0)
    batch = _flow_batch(rng)
    ckdir = str(tmp_path / "ck")

    a = _trainer()
    for _ in range(2):
        a.step(batch, jax.random.PRNGKey(7))
    a.save_checkpoint(ckdir)          # async save at step 2
    m_a3 = a.step(batch, jax.random.PRNGKey(8))   # donates the saved buffers
    a._ckptr.wait()

    b = _trainer()
    assert b.load_checkpoint(ckdir) == 2
    assert b.step_count == 2
    # restored leaves keep their ZeRO-2/replicated shardings
    for k, v in b.params.items():
        assert v.sharding == b._param_shardings[k], k
    got = [x for x in jax.tree.leaves(b.opt_state)
           if hasattr(x, "sharding") and "dp" in str(getattr(x.sharding, "spec", ""))]
    assert got, "restored optimizer state lost its dp sharding"

    m_b3 = b.step(batch, jax.random.PRNGKey(8))
    assert m_b3["loss"] == m_a3["loss"], (m_b3, m_a3)
    assert m_b3["grad_norm"] == m_a3["grad_norm"]


def test_retention_and_latest(tmp_path):
    ckdir = str(tmp_path / "ck")
    t = _trainer()
    batch = _flow_batch(np.random.default_rng(1))
    for i in range(4):
        t.step(batch, jax.random.PRNGKey(i))
        t.save_checkpoint(ckdir, keep=2)
    t._ckptr.wait()
    assert t._ckptr.latest_step() == 4
    assert t._ckptr.all_steps() == [3, 4]  # keep=2 pruned the early steps


def test_save_model_reference_format(tmp_path):
    t = _trainer()
    path = str(tmp_path / "flow_full.pt")
    out = t.save_model(path, info={"epoch": 0})
    assert out == path
    from cosy_tpu.params import load_torch_checkpoint

    loaded = load_torch_checkpoint(path)
    assert set(loaded) == set(t.params)
    sidecar = open(str(tmp_path / "flow_full.yaml")).read()
    assert "step: 0" in sidecar and "epoch: 0" in sidecar


def test_gan_trainer_checkpoint_round_trip(tmp_path):
    from cosy_tpu.models.gan import init_discriminator_params
    from cosy_tpu.models.hift import init_hift_params
    from cosy_tpu.train.gan_trainer import HiFiGanTrainer
    from test_pipeline import MODEL_CFG

    cfg = MODEL_CFG.hift
    gen = init_hift_params(jax.random.PRNGKey(0), cfg)
    disc = init_discriminator_params(jax.random.PRNGKey(1))
    t = HiFiGanTrainer(cfg, gen, disc)
    ckdir = str(tmp_path / "gan")
    t.save_checkpoint(ckdir, step=5)
    t._ckptr.wait()

    t2 = HiFiGanTrainer(cfg, init_hift_params(jax.random.PRNGKey(9), cfg),
                        init_discriminator_params(jax.random.PRNGKey(8)))
    assert t2.load_checkpoint(ckdir) == 5
    for k in gen:
        np.testing.assert_array_equal(np.asarray(t2.gen_params[k]),
                                      np.asarray(gen[k]))
    for k in disc:
        np.testing.assert_array_equal(np.asarray(t2.disc_params[k]),
                                      np.asarray(disc[k]))
