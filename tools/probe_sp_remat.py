"""Phase-3-only repro for the dp2 x seq2 x tp2 SPMD involuntary-remat
warnings (VERDICT r3 weak #1).  Runs the FullTrainer SP+TP+ZeRO-2 step on
the tiny flow topology over an 8-virtual-CPU mesh and counts
spmd_partitioner remat warnings emitted during compilation.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/probe_sp_remat.py
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import optax  # noqa: E402

from __graft_entry__ import _tiny_cfgs  # noqa: E402
from cosy_tpu.ctx import Ctx  # noqa: E402
from cosy_tpu.models import flow as F  # noqa: E402
from cosy_tpu.parallel import mesh as pmesh  # noqa: E402
from cosy_tpu.train.full_trainer import FullTrainer  # noqa: E402


def main():
    devices = jax.devices("cpu")[:8]
    mesh3 = pmesh.make_mesh(dp=2, seq=2, model=2, devices=devices)
    model_cfg, train_cfg = _tiny_cfgs()
    accum, B = train_cfg.accumulate_grad_batches, 8

    def loss_fn3(params, r, micro):
        from cosy_tpu.params import P as PV
        loss = F.flow_forward_train(PV(params), model_cfg.flow, r, micro,
                                    Ctx(rng=r, train=True), no_prompt=True)
        return loss, {}

    flow_params3 = F.init_flow_params(jax.random.PRNGKey(2), model_cfg.flow)
    ft3 = FullTrainer(loss_fn3, flow_params3, optax.adamw(1e-3), mesh=mesh3,
                      zero2=True, accum=accum, tensor_parallel=True,
                      sequence_parallel=True)
    rng = np.random.default_rng(0)
    flow_batch3 = {
        "speech_token": rng.integers(0, 30, (accum, B, 9)).astype(np.int32),
        "speech_token_len": np.full((accum, B), 9, np.int32),
        "speech_feat": (rng.standard_normal((accum, B, 16, 8)) * 2 - 6).astype(np.float32),
        "speech_feat_len": np.full((accum, B), 16, np.int32),
        "embedding": rng.standard_normal((accum, B, 12)).astype(np.float32),
    }
    m3 = ft3.step(flow_batch3, jax.random.PRNGKey(6))
    assert np.isfinite(m3["loss"]), m3
    print(f"SP phase loss={m3['loss']:.4f} OK")
    os._exit(0)


if __name__ == "__main__":
    main()
