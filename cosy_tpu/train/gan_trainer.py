"""HiFiGAN (vocoder) adversarial trainer: alternating generator/discriminator
turns.

Reference behavior: cosyvoice/utils/executor.py:88-144 (train_one_epoc_gan —
discriminator step then generator step per batch, two AdamW optimizers with
their own schedules) driven by cosyvoice/bin/train.py.
"""

from __future__ import annotations

import time
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import HiFTConfig
from ..ctx import root_key
from ..params import Params
from ..models.gan import hifigan_generator_loss, hifigan_discriminator_loss
from ..parallel import mesh as pmesh


class HiFiGanTrainer:
    def __init__(
        self,
        cfg: HiFTConfig,
        gen_params: Params,
        disc_params: Params,
        gen_lr: float = 2e-4,
        disc_lr: float = 2e-4,
        mel_weight: float = 45.0,
        feat_match_weight: float = 2.0,
        tpr_weight: float = 1.0,
        tpr_tau: float = 0.04,
        grad_clip: float = 5.0,
        mesh=None,
    ):
        """mesh: optional dp mesh — batches shard over `dp`, params replicate
        and both turns' gradient psums ride the mesh (the DDP arrangement the
        reference trains HiFiGAN under, train_utils.py:94-108)."""
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            gen_params = pmesh.replicate_tree(mesh, gen_params)
            disc_params = pmesh.replicate_tree(mesh, disc_params)
        self.gen_params = gen_params
        self.disc_params = disc_params
        self.weights = dict(mel_weight=mel_weight, feat_match_weight=feat_match_weight,
                            tpr_weight=tpr_weight, tpr_tau=tpr_tau)
        self.gen_opt = optax.chain(optax.clip_by_global_norm(grad_clip), optax.adamw(gen_lr))
        self.disc_opt = optax.chain(optax.clip_by_global_norm(grad_clip), optax.adamw(disc_lr))
        self.gen_opt_state = self.gen_opt.init(gen_params)
        self.disc_opt_state = self.disc_opt.init(disc_params)
        self._gen_step = None
        self._disc_step = None

    def _build(self):
        cfg, w = self.cfg, self.weights
        gen_opt, disc_opt = self.gen_opt, self.disc_opt

        def gen_loss(gp, dp, rng, batch):
            out = hifigan_generator_loss(
                gp, dp, cfg, rng, batch, w["mel_weight"], w["feat_match_weight"],
                w["tpr_weight"], w["tpr_tau"])
            return out["loss"], out

        def disc_loss(dp, gp, rng, batch):
            out = hifigan_discriminator_loss(gp, dp, cfg, rng, batch,
                                             w["tpr_weight"], w["tpr_tau"])
            return out["loss"], out

        def gen_step(gp, gos, dp, rng, batch):
            (_, metrics), grads = jax.value_and_grad(gen_loss, has_aux=True)(gp, dp, rng, batch)
            updates, gos = gen_opt.update(grads, gos, gp)
            return optax.apply_updates(gp, updates), gos, metrics

        def disc_step(dp, dos, gp, rng, batch):
            (_, metrics), grads = jax.value_and_grad(disc_loss, has_aux=True)(dp, gp, rng, batch)
            updates, dos = disc_opt.update(grads, dos, dp)
            return optax.apply_updates(dp, updates), dos, metrics

        self._gen_step = jax.jit(gen_step, donate_argnums=(0, 1))
        self._disc_step = jax.jit(disc_step, donate_argnums=(0, 1))

    def step(self, batch: Dict[str, np.ndarray], rng: jax.Array) -> Dict[str, float]:
        """One discriminator turn + one generator turn (executor.py:100-140)."""
        if self._gen_step is None:
            self._build()
        if self.mesh is not None:
            batch = pmesh.shard_batch(self.mesh, batch, batch_axis=0)
        k1, k2 = jax.random.split(rng)
        self.disc_params, self.disc_opt_state, d_metrics = self._disc_step(
            self.disc_params, self.disc_opt_state, self.gen_params, k1, batch)
        self.gen_params, self.gen_opt_state, g_metrics = self._gen_step(
            self.gen_params, self.gen_opt_state, self.disc_params, k2, batch)
        # one packed fetch for both turns' metrics (per-leaf float() costs a
        # host round-trip each through the remote-TPU tunnel)
        dk, gk = sorted(d_metrics), sorted(g_metrics)
        vals = np.asarray(jnp.stack([d_metrics[k] for k in dk] +
                                    [g_metrics[k] for k in gk]))
        out = {f"disc/{k}": v for k, v in zip(dk, vals[: len(dk)].tolist())}
        out.update({f"gen/{k}": v for k, v in zip(gk, vals[len(dk):].tolist())})
        return out

    # -- checkpoint / resume (orbax; reference: executor.py:88-144 GAN path
    # saves via the same rank-0 save_model, train_utils.py:195-214) --------

    def save_checkpoint(self, directory: str, step: int, keep: int = 3,
                        async_save: bool = True) -> int:
        from .checkpoint import TrainCheckpointer

        import os as _os

        if getattr(self, "_ckptr", None) is None or \
                self._ckptr.directory != _os.path.abspath(directory):
            self._ckptr = TrainCheckpointer(directory, keep=keep,
                                            async_save=async_save)
        self._ckptr.save(step, {
            "gen_params": self.gen_params, "disc_params": self.disc_params,
            "gen_opt_state": self.gen_opt_state,
            "disc_opt_state": self.disc_opt_state})
        return step

    def load_checkpoint(self, directory: str, step=None) -> int:
        from .checkpoint import TrainCheckpointer

        ck = getattr(self, "_ckptr", None) or TrainCheckpointer(directory)
        self._ckptr = ck
        ck.wait()
        step = step if step is not None else ck.latest_step()
        restored = ck.restore({
            "gen_params": self.gen_params, "disc_params": self.disc_params,
            "gen_opt_state": self.gen_opt_state,
            "disc_opt_state": self.disc_opt_state}, step)
        self.gen_params = restored["gen_params"]
        self.disc_params = restored["disc_params"]
        self.gen_opt_state = restored["gen_opt_state"]
        self.disc_opt_state = restored["disc_opt_state"]
        return int(step)

    def fit(self, loader: Iterable, epochs: int, rng: Optional[jax.Array] = None,
            log_every: int = 10):
        # "rbg" = TPU hardware RNG for the dropout/noise streams (see
        # ctx.root_key); pass an explicit threefry key for bit-reproducibility
        rng = rng if rng is not None else root_key(0, "rbg")
        step = 0
        for epoch in range(epochs):
            t0 = time.time()
            for batch in loader:
                m = self.step(batch, jax.random.fold_in(rng, step))
                if step % log_every == 0:
                    line = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
                    print(f"gan epoch {epoch} step {step}: {line}")
                step += 1
            print(f"== gan epoch {epoch} done ({time.time() - t0:.1f}s)")
        return self.gen_params, self.disc_params
