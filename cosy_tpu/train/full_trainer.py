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

import os
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
        tensor_parallel: bool = False,
        sequence_parallel: bool = False,
        pipeline_parallel_microbatches: int = 0,
    ):
        """tensor_parallel=True additionally splits the transformer matmuls
        over the mesh's ``model`` axis (parallel/tp.py rules) — Megatron-style
        row/column sharding with XLA-inserted collectives.  The reference has
        no TP (SURVEY §2.5); this is scale-out beyond its DDP ceiling.

        sequence_parallel=True activates the seq-axis activation sharding
        context while the loss is traced (parallel/sp.py): models that drop
        shard_seq annotations (the flow/estimator training forward) shard
        their time axis over the mesh ``seq`` axis.

        pipeline_parallel_microbatches=M (> 0) activates the GPipe pipeline
        context (parallel/pp.py): eligible transformer stacks inside the loss
        (dropout-free, stage-divisible over the ``model`` axis) run
        microbatch-pipelined with M microbatches."""
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        if pipeline_parallel_microbatches > 0:
            from ..parallel.pp import pipeline_context

            _mesh_pp, _inner_pp, _m = self.mesh, loss_fn, pipeline_parallel_microbatches

            def loss_fn_pp(params, r, micro):
                with pipeline_context(_mesh_pp, _m):
                    return _inner_pp(params, r, micro)

            loss_fn = loss_fn_pp
        if sequence_parallel:
            from ..parallel.sp import sequence_sharding

            _mesh, _inner = self.mesh, loss_fn

            def loss_fn_sp(params, r, micro):
                with sequence_sharding(_mesh):
                    return _inner(params, r, micro)

            loss_fn = loss_fn_sp
        self.sequence_parallel = sequence_parallel
        self.loss_fn = loss_fn
        self.optimizer = optax.chain(optax.clip_by_global_norm(grad_clip), optimizer)
        self.accum = accum
        self.zero2 = zero2

        if tensor_parallel:
            from ..parallel import tp as tpmod

            self._param_shardings = tpmod.tp_param_shardings(self.mesh, params)
        else:
            rep = pmesh.replicated(self.mesh)
            self._param_shardings = {k: rep for k in params}
        self.params = {k: jax.device_put(v, self._param_shardings[k])
                       for k, v in params.items()}
        self.tensor_parallel = tensor_parallel
        opt_state = self.optimizer.init(self.params)
        if zero2 or tensor_parallel:
            shardings = self._opt_sharding_tree(opt_state)
            self.opt_state = jax.tree.map(jax.device_put, opt_state, shardings)
            self._opt_shardings = shardings
        else:
            rep = pmesh.replicated(self.mesh)
            self.opt_state = jax.tree.map(lambda x: jax.device_put(x, rep), opt_state)
            self._opt_shardings = jax.tree.map(lambda _: rep, opt_state)
        self.step_count = 0
        self._step_fn = None

    def _opt_sharding_tree(self, opt_state):
        """Optimizer-state shardings: moment trees mirror the param tree, so
        reuse the per-param layout (TP split + optionally one more free axis
        over dp = ZeRO-2); scalars and unrecognized leaves replicate."""
        from ..parallel import tp as tpmod

        base = self._param_shardings
        layout = tpmod.compose_zero2(self.mesh, self.params, base) \
            if self.zero2 else base
        flat_names = set(self.params)

        def spec_for(path, x):
            # moment trees are dicts keyed like params; match by last dict key
            for entry in reversed(path):
                key = getattr(entry, "key", None)
                if key in flat_names and getattr(x, "shape", None) == self.params[key].shape:
                    return layout[key]
            if self.zero2:
                return zero2_sharding(self.mesh, x)
            return pmesh.replicated(self.mesh)

        return jax.tree_util.tree_map_with_path(spec_for, opt_state)

    def _build(self):
        optimizer, accum = self.optimizer, self.accum
        param_shardings = self._param_shardings
        if self.zero2:
            from ..parallel import tp as tpmod

            grad_shardings = tpmod.compose_zero2(self.mesh, self.params,
                                                 self._param_shardings)
        else:
            grad_shardings = param_shardings

        def train_step(params, opt_state, super_batch, rng):
            rngs = jax.random.split(rng, accum)

            def body(carry, xs):
                gsum, lsum, asum = carry
                micro, r = xs
                (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                    params, r, micro)
                # under seq sharding, keep per-micro grads and the
                # accumulator in the PARAM layout: without this pin the
                # post-scan ZeRO-2 layout propagates back into the scan
                # carry and the partitioner falls into involuntary full
                # rematerialization on the AD-generated conv-weight reverse
                # ops (13 warnings -> 0, tools/probe_sp_remat.py); the
                # reduce-scatter then happens once, after the scan.  dp-only
                # ZeRO-2 keeps the unpinned carry (per-micro reduce-scatter
                # is half the bytes of the allreduce this pin would force).
                if self.sequence_parallel:
                    grads = jax.lax.with_sharding_constraint(grads, param_shardings)
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
        # one packed fetch — per-leaf float() costs a host round-trip each
        # through the remote-TPU tunnel
        keys = sorted(metrics)
        vals = np.asarray(jnp.stack([metrics[k] for k in keys]))
        return dict(zip(keys, vals.tolist()))

    # ------------------------------------------------------------------
    # checkpoint / resume (reference: train_utils.py:195-214 save_model +
    # bin/train.py:135-153 resume; DeepSpeed save_checkpoint for ZeRO) —
    # orbax sharded async saves, every host writes its own shards
    # ------------------------------------------------------------------

    def _checkpointer(self, directory: str, keep: int = 3,
                      async_save: bool = True):
        from .checkpoint import TrainCheckpointer

        if getattr(self, "_ckptr", None) is None or \
                self._ckptr.directory != os.path.abspath(directory):
            self._ckptr = TrainCheckpointer(directory, keep=keep,
                                            async_save=async_save)
        return self._ckptr

    def save_checkpoint(self, directory: str, keep: int = 3,
                        async_save: bool = True) -> int:
        """Save params + optimizer state + step at the current step number.
        Async: returns once the device->host copy is done (donation-safe);
        the write overlaps subsequent steps.  Returns the step saved."""
        ck = self._checkpointer(directory, keep=keep, async_save=async_save)
        ck.save(self.step_count,
                {"params": self.params, "opt_state": self.opt_state})
        return self.step_count

    def load_checkpoint(self, directory: str, step=None) -> int:
        """Restore params/opt_state onto their CURRENT shardings (dp/ZeRO-2/
        TP layouts) and resume the step counter.  Returns the step loaded."""
        ck = self._checkpointer(directory)
        ck.wait()
        step = step if step is not None else ck.latest_step()
        restored = ck.restore(
            {"params": self.params, "opt_state": self.opt_state}, step)
        self.params, self.opt_state = restored["params"], restored["opt_state"]
        self.step_count = int(step)
        return self.step_count

    def save_model(self, path: str, info: Optional[Dict] = None):
        """Reference-format torch ``.pt`` + yaml sidecar (rank-0 only),
        loadable by stock CosyVoice / compat.load_torch_checkpoint."""
        from .checkpoint import save_model_pt

        meta = {"step": self.step_count}
        meta.update(info or {})
        return save_model_pt(self.params, path, info=meta)
