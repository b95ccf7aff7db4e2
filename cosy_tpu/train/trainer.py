"""Joint LLM+Flow LoRA trainer: pjit step function + training loop.

Reference behavior: train_joint.py (Lightning loop: AdamW on trainable params,
warmup-cosine LR, grad accumulation 16, clip 1.0, loss-threshold and
early-stop callbacks, top-k checkpointing, merged-weight export).

TPU-first re-design:
- one jitted train step consumes an (accum, B, ...) super-batch and performs
  the full accumulation as a ``lax.scan`` — no host round-trips between
  micro-batches (the reference does accum x separate backward passes);
- only the LoRA adapter dicts are differentiated/updated; base params are a
  frozen argument (requires_grad=False equivalent);
- data parallelism: batch axis sharded over the ``dp`` mesh axis, params
  replicated — XLA emits the gradient psum over ICI;
- checkpoints are flat-array snapshots of (loras, opt_state leaves, step),
  plus torch-format merged exports loadable by stock CosyVoice.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig, TrainConfig
from ..ctx import root_key
from ..params import Params, save_torch_checkpoint
from ..lora import init_lora, merge_lora
from ..models.joint import joint_forward_train
from ..parallel import mesh as pmesh
from .schedules import make_schedule


@dataclass
class TrainState:
    loras: Dict[str, Params]
    opt_state: Any
    step: int = 0


class JointTrainer:
    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        llm_params: Params,
        flow_params: Params,
        out_dir: str = "output",
        mesh=None,
        total_steps: int = 10_000,
    ):
        self.cfg = model_cfg
        self.tcfg = train_cfg
        if train_cfg.bf16:
            import jax.numpy as _jnp
            from ..params import cast as _cast
            # bf16 base params + activations; LoRA adapters and optimizer
            # state stay fp32 masters (the TPU equivalent of '16-mixed',
            # train_joint.py:353 — no loss scaler needed for bf16)
            llm_params = _cast(llm_params, _jnp.bfloat16) if llm_params else llm_params
            flow_params = _cast(flow_params, _jnp.bfloat16) if flow_params else flow_params
        self.llm_params = llm_params
        self.flow_params = flow_params
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()

        self.schedule = make_schedule(train_cfg, total_steps)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(train_cfg.gradient_clip_val),
            optax.adamw(self.schedule, b1=0.9, b2=0.999,
                        weight_decay=train_cfg.weight_decay),
        )
        self._step_fn = None
        self._eval_fn = None
        self._metrics_log: List[dict] = []
        self._best: List[Tuple[float, str]] = []  # (loss, path) top-k

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------

    def init_state(self, rng: jax.Array) -> TrainState:
        loras: Dict[str, Params] = {}
        if self.tcfg.training_mode in ("joint", "llm_only"):
            loras["llm"] = init_lora(jax.random.fold_in(rng, 1), self.llm_params,
                                     self.tcfg.llm_lora)
        if self.tcfg.training_mode in ("joint", "flow_only"):
            loras["flow"] = init_lora(jax.random.fold_in(rng, 2), self.flow_params,
                                      self.tcfg.flow_lora)
        opt_state = self.optimizer.init(loras)
        loras = pmesh.replicate_tree(self.mesh, loras)
        opt_state = pmesh.replicate_tree(self.mesh, opt_state)
        return TrainState(loras=loras, opt_state=opt_state, step=0)

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------

    def _build_step(self):
        cfg, tcfg = self.cfg, self.tcfg
        accum = tcfg.accumulate_grad_batches
        optimizer = self.optimizer

        # base params are explicit jit arguments — closing over them would
        # bake 300M weights into the graph as constants (slow compiles, no
        # donation, recompile on object identity changes)
        def loss_fn(loras, llm_params, flow_params, rng, micro_batch):
            if tcfg.bf16:
                micro_batch = {
                    k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
                    for k, v in micro_batch.items()
                }
            losses = joint_forward_train(
                llm_params, flow_params, loras, cfg, tcfg, rng, micro_batch, train=True)
            return losses["loss"], losses

        def train_step(loras, opt_state, llm_params, flow_params, step, super_batch, rng):
            rngs = jax.random.split(rng, accum)

            def accum_body(carry, xs):
                gsum, msum = carry
                micro, r = xs
                (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    loras, llm_params, flow_params, r, micro)
                gsum = jax.tree.map(jnp.add, gsum, grads)
                msum = jax.tree.map(jnp.add, msum, metrics)
                return (gsum, msum), None

            zero_g = jax.tree.map(jnp.zeros_like, loras)
            mkeys = {"joint": ("loss", "llm_loss", "llm_acc", "flow_loss"),
                     "llm_only": ("loss", "llm_loss", "llm_acc"),
                     "flow_only": ("loss", "flow_loss")}[tcfg.training_mode]
            zero_m = {k: jnp.zeros((), jnp.float32) for k in mkeys}

            (gsum, msum), _ = jax.lax.scan(accum_body, (zero_g, zero_m), (super_batch, rngs))
            grads = jax.tree.map(lambda g: g / accum, gsum)
            metrics = jax.tree.map(lambda m: m / accum, msum)

            updates, opt_state = optimizer.update(grads, opt_state, loras)
            loras = optax.apply_updates(loras, updates)
            gnorm = optax.global_norm(grads)
            metrics = dict(metrics, grad_norm=gnorm, lr=self.schedule(step))
            return loras, opt_state, metrics

        return jax.jit(train_step, donate_argnums=(0, 1))

    def step(self, state: TrainState, super_batch: Dict[str, np.ndarray],
             rng: jax.Array) -> Dict[str, jax.Array]:
        if self._step_fn is None:
            self._step_fn = self._build_step()
        batch = pmesh.shard_batch(self.mesh, super_batch, batch_axis=1)
        loras, opt_state, metrics = self._step_fn(
            state.loras, state.opt_state, self.llm_params, self.flow_params,
            jnp.asarray(state.step), batch, rng)
        state.loras = loras
        state.opt_state = opt_state
        state.step += 1
        return metrics

    # ------------------------------------------------------------------
    # validation (reference: cosyvoice/utils/executor.py:146-176 Executor.cv)
    # ------------------------------------------------------------------

    def evaluate(self, loader, state: TrainState, rng: Optional[jax.Array] = None
                 ) -> Dict[str, float]:
        """Average eval-mode losses over a loader (dropout off, no update)."""
        rng = rng if rng is not None else root_key(0, self.tcfg.prng_impl)
        if self._eval_fn is None:
            cfg, tcfg = self.cfg, self.tcfg

            def eval_step(loras, llm_params, flow_params, super_batch, r):
                def one(micro, ri):
                    return joint_forward_train(
                        llm_params, flow_params, loras, cfg, tcfg, ri, micro, train=False)

                rngs = jax.random.split(r, tcfg.accumulate_grad_batches)
                # lax.map (not vmap): one micro-batch of activations at a
                # time, like the train step's accumulation scan — vmapping
                # the whole super-batch would materialize accum x the train
                # step's activation memory and OOM configs tuned to fit HBM
                metrics = jax.lax.map(lambda xs: one(*xs), (super_batch, rngs))
                return jax.tree.map(jnp.mean, metrics)

            self._eval_fn = jax.jit(eval_step)

        # accumulate on device, fetch once (per-leaf float() would cost one
        # host round-trip per metric per batch through the tunnel)
        mkeys: Optional[List[str]] = None
        packed: List[jax.Array] = []
        for i, super_batch in enumerate(loader):
            batch = pmesh.shard_batch(self.mesh, super_batch, batch_axis=1)
            m = self._eval_fn(state.loras, self.llm_params, self.flow_params,
                              batch, jax.random.fold_in(rng, i))
            if mkeys is None:
                mkeys = sorted(m)
            packed.append(jnp.stack([m[k] for k in mkeys]))
        if not packed:
            return {}
        avg = np.asarray(jnp.mean(jnp.stack(packed), axis=0))  # one fetch
        return {("cv_" + k): float(v) for k, v in zip(mkeys, avg)}

    # ------------------------------------------------------------------
    # fit loop with callbacks (reference: train_joint.py:58-103, 325-360)
    # ------------------------------------------------------------------

    def fit(
        self,
        loader,
        state: Optional[TrainState] = None,
        rng: Optional[jax.Array] = None,
        max_epochs: Optional[int] = None,
        resume: Optional[str] = None,
        log_every: int = 10,
    ) -> TrainState:
        rng = rng if rng is not None else root_key(self.tcfg.seed, self.tcfg.prng_impl)
        if state is None:
            state = self.init_state(jax.random.fold_in(rng, 0))
        if resume:
            state = self.load_checkpoint(resume, state)
            print(f"Resumed from {resume} at step {state.step}")

        max_epochs = max_epochs or self.tcfg.max_epochs
        best_epoch_loss = float("inf")
        epochs_no_improve = 0
        stop_reason = None
        metrics_path = os.path.join(self.out_dir, "metrics.jsonl")
        # TB scalars next to the jsonl (reference train_utils.py:187-192);
        # no-op when the tensorboard package is absent
        from ..utils.tb import TBWriter

        tb = TBWriter(os.path.join(self.out_dir, "tensorboard"))

        # preemption-aware checkpointing: on SIGTERM/SIGINT (TPU-VM
        # maintenance events arrive as SIGTERM) finish the in-flight step,
        # save a resumable snapshot, and exit the loop cleanly.  The
        # reference's elastic story is torch-elastic @record + monitored
        # barriers (bin/train.py:28,96; train_utils.py:217-235) with no
        # state preservation on preemption.
        import signal as _signal

        self._preempted = False

        def _on_signal(signum, frame):  # noqa: ARG001
            self._preempted = True
            print(f"signal {signum}: checkpointing at next step boundary")

        def _any_host_preempted():
            # multi-host: every process must take the same branch or the
            # next step's collectives would hang on a subset of hosts
            # (same rationale as utils.distributed.joined_loader)
            from ..utils.distributed import all_hosts_agree

            return not all_hosts_agree(not self._preempted)

        self._any_host_preempted = _any_host_preempted

        old_handlers = {}
        for sig in (_signal.SIGTERM, _signal.SIGINT):
            try:
                old_handlers[sig] = _signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread
                pass

        from ..utils.distributed import joined_loader

        for epoch in range(max_epochs):
            t0 = time.time()
            # Metrics stay on device, packed into one vector per step; host
            # fetches happen only at print points and once per epoch.  A
            # per-step per-leaf float() would cost one host round-trip per
            # metric per step — through the remote-TPU tunnel (~30 ms RTT)
            # that overhead would rival the step itself.
            mkeys: Optional[List[str]] = None
            packed_steps: List[jax.Array] = []
            step_ids: List[int] = []
            # uneven-workload escape: all hosts leave the epoch on the same
            # step (reference model.join/cosyvoice_join semantics)
            for super_batch in joined_loader(loader):
                m = self.step(state, super_batch, jax.random.fold_in(rng, state.step + 1))
                if mkeys is None:
                    mkeys = sorted(m)
                packed_steps.append(jnp.stack([m[k] for k in mkeys]))
                step_ids.append(state.step)
                if state.step % log_every == 0:
                    vals = np.asarray(packed_steps[-1])  # one fetch
                    line = " ".join(f"{k}={v:.4f}" for k, v in zip(mkeys, vals))
                    print(f"epoch {epoch} step {state.step}: {line}")
                if self._any_host_preempted():
                    break

            def _flush_metrics():
                # one stacked fetch for the epoch's (possibly partial) metrics
                vals = np.asarray(jnp.stack(packed_steps))  # (n_steps, n_metrics)
                ms = [dict(zip(mkeys, row.tolist())) for row in vals]
                for sid, m_host in zip(step_ids, ms):
                    self._metrics_log.append({"epoch": epoch, "step": sid, **m_host})
                    tb.add_scalars(sid, m_host)
                tb.flush()
                return ms

            if self._any_host_preempted():
                if packed_steps:
                    _flush_metrics()  # don't drop the partial epoch's metrics
                path = self.save_checkpoint(os.path.join(
                    self.out_dir, f"joint_{self.tcfg.training_mode}_preempt.ckpt"), state)
                stop_reason = f"preempted — resumable snapshot at {path} (step {state.step})"
                print(f"Stopping: {stop_reason}")
                break
            if not packed_steps:
                print("empty epoch — no data")
                break

            epoch_metrics = _flush_metrics()

            avg = {k: float(np.mean([m[k] for m in epoch_metrics])) for k in epoch_metrics[0]}
            dt = time.time() - t0
            print(f"== epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in sorted(avg.items()))
                  + f" ({dt:.1f}s, {len(epoch_metrics)} steps)")
            with open(metrics_path, "a") as f:
                f.write(json.dumps({"epoch": epoch, **avg}) + "\n")

            self._save_topk(state, epoch, avg["loss"])
            self.save_checkpoint(os.path.join(
                self.out_dir, f"joint_{self.tcfg.training_mode}_last.ckpt"), state)

            # loss-threshold stop (train_joint.py:74-102)
            llm_loss = avg.get("llm_loss")
            if llm_loss is not None and llm_loss <= self.tcfg.llm_loss_threshold:
                stop_reason = f"llm_loss {llm_loss:.4f} <= {self.tcfg.llm_loss_threshold}"
            flow_loss = avg.get("flow_loss")
            if stop_reason is None and flow_loss is not None \
                    and flow_loss <= self.tcfg.flow_loss_threshold:
                stop_reason = f"flow_loss {flow_loss:.4f} <= {self.tcfg.flow_loss_threshold}"

            # early stopping (train_joint.py:325-331)
            if avg["loss"] < best_epoch_loss - self.tcfg.early_stop_min_delta:
                best_epoch_loss = avg["loss"]
                epochs_no_improve = 0
            else:
                epochs_no_improve += 1
                if epochs_no_improve >= self.tcfg.early_stop_patience:
                    stop_reason = f"early stop: no improvement for {epochs_no_improve} epochs"

            if stop_reason:
                print(f"Stopping: {stop_reason}")
                break

        for sig, h in old_handlers.items():
            _signal.signal(sig, h)
        return state

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def _save_topk(self, state: TrainState, epoch: int, loss: float, k: int = 3):
        path = os.path.join(
            self.out_dir, f"joint_{self.tcfg.training_mode}_{epoch:02d}_{loss:.4f}.ckpt")
        path = self.save_checkpoint(path, state)
        self._best.append((loss, path))
        self._best.sort(key=lambda x: x[0])
        for _, stale in self._best[k:]:
            if os.path.exists(stale):
                os.remove(stale)
        self._best = self._best[:k]

    def save_checkpoint(self, path: str, state: TrainState) -> str:
        if not path.endswith(".npz"):
            path = path + ".npz"
        leaves, _ = jax.tree.flatten((state.loras, state.opt_state))
        arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(leaves)}
        np.savez(path, step=state.step, n_leaves=len(leaves), **arrays)
        return path

    def load_checkpoint(self, path: str, template: TrainState) -> TrainState:
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        blob = np.load(path, allow_pickle=False)
        n = int(blob["n_leaves"])
        leaves = [jnp.asarray(blob[f"leaf_{i}"]) for i in range(n)]
        treedef = jax.tree.structure((template.loras, template.opt_state))
        loras, opt_state = jax.tree.unflatten(treedef, leaves)
        loras = pmesh.replicate_tree(self.mesh, loras)
        opt_state = pmesh.replicate_tree(self.mesh, opt_state)
        return TrainState(loras=loras, opt_state=opt_state, step=int(blob["step"]))

    # ------------------------------------------------------------------
    # merged export (reference: train_joint.py:370-384)
    # ------------------------------------------------------------------

    def export_merged(self, state: TrainState, save: bool = True) -> Dict[str, Params]:
        from ..params import cast as _cast

        out: Dict[str, Params] = {}
        if "llm" in state.loras:
            out["llm"] = merge_lora(_cast(self.llm_params, jnp.float32),
                                    state.loras["llm"], self.tcfg.llm_lora.scaling)
        if "flow" in state.loras:
            out["flow"] = merge_lora(_cast(self.flow_params, jnp.float32),
                                     state.loras["flow"], self.tcfg.flow_lora.scaling)
        if save:
            from ..params import save_weight_meta

            for name, params in out.items():
                path = os.path.join(self.out_dir, f"{name}_merged_{self.tcfg.training_mode}.pt")
                save_torch_checkpoint(params, path)
                if name == "flow":
                    # fine-tuned flow weights operate in normalized mel
                    # space (the fine-tune loss, MEL -6.0/2.0) — record it
                    # so serve.py --flow-weights defaults finetuned_norm
                    # from provenance instead of guessing
                    save_weight_meta(path, mel_space="normalized",
                                     producer="cosy_tpu.export_merged")
                print(f"saved merged {name} weights -> {path}")
        return out

    def export_adapters(self, state: TrainState, path: Optional[str] = None) -> Params:
        """Adapter-only export (reference: lora.py:230-256 save_lora_weights)
        for multi-voice serving: one base model + this file per voice
        (serve.py --voices name=adapters.pt).  Flat keys are
        ``llm.<param path>.lora_A/B`` / ``flow.<...>`` plus ``._scaling``
        scalars recording the adapters' alpha/r."""
        out: Params = {}
        for name, cfg in (("llm", self.tcfg.llm_lora),
                          ("flow", self.tcfg.flow_lora)):
            if name in state.loras:
                out.update({f"{name}.{k}": jnp.asarray(v, jnp.float32)
                            for k, v in state.loras[name].items()})
                out[f"{name}._scaling"] = jnp.asarray(cfg.scaling, jnp.float32)
        if path is not None:
            save_torch_checkpoint(out, path)
            print(f"saved LoRA adapters -> {path}")
        return out
