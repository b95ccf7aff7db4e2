"""Generic full-parameter trainer with ZeRO-2-style optimizer-state sharding.

Reference behavior: the vendored multi-GPU trainer path
(cosyvoice/bin/train.py + utils/executor.py + utils/train_utils.py): DDP
gradient allreduce, optional DeepSpeed ZeRO-2 optimizer-state sharding, grad
accumulation with no_sync, clip + inf/nan skip, per-step scheduler.

TPU-native design:
- data parallelism: batch sharded over the ``dp`` mesh axis; the gradient
  psum is inserted by XLA (the DDP allreduce equivalent, over ICI);
- ZeRO-2: optimizer moments are sharded over ``dp`` (each device keeps 1/N of
  the Adam m/v states); gradients are sharding-constrained to the same layout
  before the update, which XLA lowers to a reduce-scatter, and the parameter
  update all-gathers — the standard ZeRO-2 communication pattern;
- the inf/nan gradient skip (train_utils.py:305-315) is a jnp.where on the
  global grad norm.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as PSpec

from ..params import Params
from ..parallel import mesh as pmesh


def zero2_sharding(mesh, tree):
    """Per-leaf NamedSharding: shard the first axis divisible by the dp size,
    replicate scalars and indivisible leaves."""
    dp = mesh.shape["dp"]

    def spec_for(x):
        shape = getattr(x, "shape", ())
        for axis, dim in enumerate(shape):
            if dim % dp == 0 and dim >= dp:
                parts = [None] * len(shape)
                parts[axis] = "dp"
                return NamedSharding(mesh, PSpec(*parts))
        return NamedSharding(mesh, PSpec())

    return jax.tree.map(spec_for, tree)


class FullTrainer:
    """Train all parameters of an arbitrary loss function."""

    def __init__(
        self,
        loss_fn: Callable[[Params, jax.Array, Dict], Tuple[jax.Array, Dict]],
        params: Params,
        optimizer: optax.GradientTransformation,
        mesh=None,
        zero2: bool = True,
        grad_clip: float = 5.0,
        accum: int = 1,
    ):
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        self.loss_fn = loss_fn
        self.optimizer = optax.chain(optax.clip_by_global_norm(grad_clip), optimizer)
        self.accum = accum
        self.zero2 = zero2

        rep = pmesh.replicated(self.mesh)
        self.params = jax.tree.map(lambda x: jax.device_put(x, rep), params)
        opt_state = self.optimizer.init(self.params)
        if zero2:
            shardings = zero2_sharding(self.mesh, opt_state)
            self.opt_state = jax.tree.map(jax.device_put, opt_state, shardings)
            self._opt_shardings = shardings
        else:
            self.opt_state = jax.tree.map(lambda x: jax.device_put(x, rep), opt_state)
            self._opt_shardings = jax.tree.map(lambda _: rep, opt_state)
        self.step_count = 0
        self._step_fn = None

    def _build(self):
        optimizer, accum = self.optimizer, self.accum
        param_shardings = jax.tree.map(lambda _: pmesh.replicated(self.mesh), self.params)
        grad_shardings = zero2_sharding(self.mesh, self.params) if self.zero2 else param_shardings

        def train_step(params, opt_state, super_batch, rng):
            rngs = jax.random.split(rng, accum)

            def body(carry, xs):
                gsum, lsum, asum = carry
                micro, r = xs
                (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                    params, r, micro)
                asum = jax.tree.map(
                    lambda a, s: s + a.astype(jnp.float32), aux, asum)
                return (jax.tree.map(jnp.add, gsum, grads), lsum + loss, asum), None

            zero = jax.tree.map(jnp.zeros_like, params)
            # probe the aux structure (scalar metrics) without running compute
            aux_shape = jax.eval_shape(self.loss_fn, params, rngs[0],
                                       jax.tree.map(lambda x: x[0], super_batch))[1]
            zero_aux = jax.tree.map(lambda s: jnp.zeros((), jnp.float32), aux_shape)
            (gsum, lsum, asum), _ = jax.lax.scan(
                body, (zero, jnp.zeros(()), zero_aux), (super_batch, rngs))
            grads = jax.tree.map(lambda g: g / accum, gsum)
            aux_metrics = jax.tree.map(lambda a: a / accum, asum)
            # ZeRO-2: reduce-scatter the gradients into the optimizer layout
            grads = jax.lax.with_sharding_constraint(grads, grad_shardings)

            gnorm = optax.global_norm(grads)
            finite = jnp.isfinite(gnorm)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            updates = jax.lax.with_sharding_constraint(updates, param_shardings)
            # inf/nan skip (train_utils.py:305-315)
            params = jax.tree.map(
                lambda p, u: jnp.where(finite, p + u.astype(p.dtype), p), params, updates)
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old) if hasattr(new, "dtype") else new,
                new_opt, opt_state)
            return params, opt_state, {"loss": lsum / accum, "grad_norm": gnorm,
                                       "skipped": (~finite).astype(jnp.float32),
                                       **aux_metrics}

        self._step_fn = jax.jit(
            train_step, donate_argnums=(0, 1),
            out_shardings=(param_shardings, self._opt_shardings, None))

    def step(self, super_batch: Dict[str, np.ndarray], rng: jax.Array) -> Dict[str, float]:
        if self._step_fn is None:
            self._build()
        batch = pmesh.shard_batch(self.mesh, super_batch, batch_axis=1)
        self.params, self.opt_state, metrics = self._step_fn(
            self.params, self.opt_state, batch, rng)
        self.step_count += 1
        return {k: float(v) for k, v in metrics.items()}
