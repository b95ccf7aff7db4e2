"""Few-step MeanFlow distillation of the CFM mel estimator.

Beyond-reference capability: the reference synthesizes mel with a 10-20 step
Euler solve at CFG batch 2 (reference: flow_model.py:94-125, 525-536), i.e.
20-40 estimator calls per utterance.  MeanFlow distillation (Geng et al.
2025, "Mean Flows for One-step Generative Modeling"; IntMeanFlow 2025 for
the speech application — see PAPERS.md) trains an AVERAGE-velocity field

    u(y_t, t, s) = (1 / (s - t)) * integral_t^s v(y_tau, tau) d tau

so synthesis becomes 1-2 estimator calls with classifier-free guidance
folded in — a 10-40x flow-solve cost cut at serving time, traded against a
distillation-quality loss that must be validated per voice (like the banded
attention option, PERF.md): the samplers ship opt-in.

Two training targets, in this codebase's convention (t = 0 noise -> t = 1
data; y_t = (1 - (1 - sigma) t) z + t x1, models/flow.cfm_compute_loss),
both using the TEACHER's CFG-mixed velocity v = (1 + w) v_cond - w v_uncond
so guidance distills into u:

- "integral" (default; IntMeanFlow-style integral velocity distillation):
  u_tgt = (y_s - y_t) / (s - t) with y_s rolled by m teacher Euler
  sub-steps over [t, s] — a plain regression onto a fixed target.
  Measured on the tiny test topology: converges in ~100 steps, distilled
  1-step error below the undistilled 4-step sampler's.
- "jvp" (the MeanFlow identity):
      F(t) = integral_t^s v d tau = (s - t) u(y_t, t, s);  dF/dt = -v(y_t, t)
      =>  u_tgt = v + (s - t) * (du/dt),   du/dt = d_y u . v + d_t u
  with du/dt one jax.jvp of the student along tangent (v, 1, 0), u_tgt
  stop-gradiented, and the paper's adaptive ||.||^2p weighting.  One teacher
  call per step, but the target bootstraps through the student's own
  derivative — measured stable-but-slow on short budgets; use for long
  horizons where m teacher calls/step dominate.

Student architecture: the teacher's estimator plus a second time-embedding
branch (``time_mlp_s``) for the integration-target time s, whose output
projection initializes to ZERO — at init u_theta(y, t, s) == v_teacher(y, t)
exactly, so distillation starts from the identity (layers/unet.py).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import EstimatorConfig, FlowConfig
from ..ctx import Ctx, EVAL, root_key
from ..layers.basic import dense
from ..layers.unet import conditional_decoder
from ..ops import masks as M
from ..params import P, Params, init_linear, save_torch_checkpoint
from ..models.flow import (_l2_normalize, cfm_solve_euler, cfm_solve_mean,
                           flow_encode, length_regulator)


# ---------------------------------------------------------------------------
# Student construction
# ---------------------------------------------------------------------------


def add_meanflow_time_branch(
    params: Params,
    est_cfg: EstimatorConfig,
    key: jax.Array,
    prefix: str = "decoder.estimator.",
) -> Params:
    """Copy of ``params`` with the ``time_mlp_s`` branch added under
    ``prefix``: linear_1 initialized normally, linear_2 zero so the student
    equals the teacher at init (tested by test_distill.py)."""
    out = dict(params)
    d: Params = {}
    init_linear(key, d, "time_mlp_s.linear_1", est_cfg.in_channels,
                est_cfg.time_embed_dim)
    for k, v in d.items():
        out[prefix + k] = v
    ted = est_cfg.time_embed_dim
    out[prefix + "time_mlp_s.linear_2.weight"] = jnp.zeros((ted, ted), jnp.float32)
    out[prefix + "time_mlp_s.linear_2.bias"] = jnp.zeros((ted,), jnp.float32)
    return out


def student_subset(flow_params: Params, prefix: str = "decoder.estimator.") -> Params:
    """The trainable subtree: estimator weights (incl. time_mlp_s)."""
    return {k: v for k, v in flow_params.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# Distillation loss
# ---------------------------------------------------------------------------


def meanflow_distill_loss(
    student: Params,  # full flow param dict incl. time_mlp_s (trainable part
    #                   merged in by the caller so grads flow through it)
    teacher: Params,  # frozen flow param dict (no time_mlp_s needed)
    cfg: FlowConfig,
    rng: jax.Array,
    x1: jax.Array,  # (B, 80, T) target mel (normalized)
    mask: jax.Array,  # (B, 1, T)
    mu: jax.Array,  # (B, 80, T) encoder output at mel rate
    spks: jax.Array,  # (B, 80)
    cond: jax.Array,  # (B, 80, T)
    cfg_rate: Optional[float] = None,  # None -> cfg.cfm.inference_cfg_rate
    inst_frac: float = 0.25,  # probability of s == t (instantaneous anchor)
    noise: Optional[tuple] = None,  # (t (B,), s (B,), z (B,80,T)) override
    adaptive_p: float = 0.75,  # 0 = plain MSE
    target: str = "integral",  # "integral" (teacher sub-steps) | "jvp"
    teacher_substeps: int = 4,
    causal: bool = False,  # CosyVoice2 causal estimator (models/flow2.py)
    streaming: bool = False,  # CV2 chunked-causal attention (serving's
    #                           streaming windows run the student this way)
    static_chunk_size: int = 50,
) -> jax.Array:
    """One distillation step's loss.

    ``target="integral"`` (default, IntMeanFlow-style): regress the student's
    u(y_t, t, s) onto the teacher trajectory's realized average velocity
    (y_s - y_t) / (s - t), with y_s obtained by ``teacher_substeps`` CFG
    Euler sub-steps over [t, s] — a direct regression onto a fixed target.

    ``target="jvp"`` (MeanFlow identity, see module docstring): bootstrap
    u_tgt = v + (s - t) * du/dt with du/dt one jax.jvp of the student.
    Cheaper per step (one teacher call) but the target chases the student's
    own derivative — measurably unstable on short budgets (the adaptive
    weighting keeps it bounded, not fast); kept for long-horizon runs."""
    B, C, T = x1.shape
    w = cfg.cfm.inference_cfg_rate if cfg_rate is None else cfg_rate
    sigma = cfg.cfm.sigma_min
    # deterministic u-field: estimator dropout off for both teacher target
    # and student (distillation is a regression, not regularized training)
    est_cfg = dataclasses.replace(cfg.estimator, dropout=0.0)

    k_t, k_s, k_e, k_z = jax.random.split(rng, 4)
    if noise is not None:
        t, s, z = (jnp.asarray(a, x1.dtype) for a in noise)
    else:
        t = jax.random.uniform(k_t, (B,), x1.dtype)
        s = t + (1.0 - t) * jax.random.uniform(k_s, (B,), x1.dtype)
        s = jnp.where(jax.random.uniform(k_e, (B,)) < inst_frac, t, s)
        z = jax.random.normal(k_z, x1.shape, x1.dtype)

    tb = t[:, None, None]
    y = (1.0 - (1.0 - sigma) * tb) * z + tb * x1

    # teacher CFG-mixed velocity, cond/uncond batched 2B like cfm_solve_euler
    tp = P(teacher, "decoder.estimator.")
    mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

    def teacher_v(y_, t_):
        v2 = conditional_decoder(
            tp, est_cfg, jnp.concatenate([y_, y_], axis=0), mask2, mu2,
            jnp.concatenate([t_, t_], axis=0), spks2, cond2, EVAL,
            causal=causal, streaming=streaming,
            static_chunk_size=static_chunk_size)
        return (1.0 + w) * v2[:B] - w * v2[B:]

    sp = P(student, "decoder.estimator.")

    def u_fn(y_, t_, s_):
        # train=True keeps the student on the differentiable XLA path (the
        # fused-block Pallas kernel is inference-only, ops/fused_block.py)
        return conditional_decoder(sp, est_cfg, y_, mask, mu, t_, spks,
                                   cond, Ctx(train=True), causal=causal,
                                   streaming=streaming,
                                   static_chunk_size=static_chunk_size, s=s_)

    if target == "integral":
        m = teacher_substeps
        dt = (s - t) / m  # (B,), zero where s == t

        def sub(carry, _):
            x_, t_ = carry
            v_i = teacher_v(x_, t_)
            return (x_ + dt[:, None, None] * v_i.astype(x_.dtype),
                    t_ + dt), v_i

        (y_s, _), vs = jax.lax.scan(sub, (y, t), None, length=m)
        span = (s - t)[:, None, None]
        u_tgt = jnp.where(span > 1e-6, (y_s - y) / jnp.maximum(span, 1e-6),
                          vs[0])  # s == t anchor: the instantaneous field
        u_tgt = jax.lax.stop_gradient(u_tgt).astype(y.dtype)
        u = u_fn(y, t, s)
    elif target == "jvp":
        v = jax.lax.stop_gradient(teacher_v(y, t)).astype(y.dtype)
        u, du_dt = jax.jvp(u_fn, (y, t, s),
                           (v, jnp.ones_like(t), jnp.zeros_like(s)))
        u_tgt = jax.lax.stop_gradient(v + (s - t)[:, None, None] * du_dt)
    else:
        raise ValueError(f"unknown distill target {target!r}")

    diff = (u - u_tgt) * (1.0 if mask is None else mask)
    sq = jnp.square(diff.astype(jnp.float32))
    if adaptive_p <= 0:
        denom = (B * T if mask is None else jnp.sum(mask)) * C
        return jnp.sum(sq) / jnp.maximum(denom, 1.0)
    # the paper's adaptive weighting: w_i = 1/(||delta_i||^2 + c)^p,
    # stop-gradiented — tames the u_tgt bootstrap feedback (without it the
    # target chases the student's own jvp and the loss oscillates; observed
    # on the tiny test topology too)
    per_valid = (jnp.full((B,), float(T), jnp.float32) if mask is None
                 else jnp.sum(mask, axis=(1, 2))) * C
    per = jnp.sum(sq, axis=(1, 2)) / jnp.maximum(per_valid, 1.0)  # (B,)
    # NOT named ``w`` — that's the CFG rate captured by teacher_v above
    aw = jax.lax.stop_gradient(1.0 / jnp.power(per + 1e-3, adaptive_p))
    return jnp.mean(aw * per)


def flow_distill_loss(
    student_est: Params,  # trainable estimator subtree (flat, full key names)
    teacher: Params,  # frozen full flow params
    cfg: FlowConfig,
    rng: jax.Array,
    batch: Dict[str, jax.Array],
    mel_norm: Tuple[float, float] = (-6.0, 2.0),
    cfg_rate: Optional[float] = None,
    inst_frac: float = 0.25,
    adaptive_p: float = 0.75,
    target: str = "integral",
    teacher_substeps: int = 4,
) -> jax.Array:
    """Batch-level wrapper: prompt-free conditioning (the finetuned serving
    path — zero conds, like flow_forward_train(no_prompt=True)); the frozen
    teacher encoder/regulator produce mu, shared by teacher and student."""
    mean, std = mel_norm
    token = batch["speech_token"]
    token_len = batch["speech_token_len"]
    feat = (batch["speech_feat"] - mean) / std
    feat_len = batch["speech_feat_len"]
    B, T, _ = feat.shape

    tpv = P(teacher)
    spk = dense(tpv, "spk_embed_affine_layer",
                _l2_normalize(batch["embedding"], axis=1), EVAL)
    h = flow_encode(tpv, cfg, token, token_len, EVAL)
    h = length_regulator(tpv.sub("length_regulator"), h, feat_len, T,
                         cfg.regulator_stages, EVAL)
    h = jax.lax.stop_gradient(h)
    spk = jax.lax.stop_gradient(spk)

    mask = M.make_non_pad_mask(feat_len, T)[:, None, :].astype(h.dtype)
    conds = jnp.zeros((B, cfg.output_size, T), h.dtype)
    student = {**teacher, **student_est}
    return meanflow_distill_loss(
        student, teacher, cfg, rng, feat.transpose(0, 2, 1), mask,
        h.transpose(0, 2, 1), spk, conds, cfg_rate=cfg_rate,
        inst_frac=inst_frac, adaptive_p=adaptive_p, target=target,
        teacher_substeps=teacher_substeps)


def flow2_distill_loss(
    student_est: Params,  # trainable estimator subtree (flat, full key names)
    teacher: Params,  # frozen full flow2 params
    cfg,  # Flow2Config
    rng: jax.Array,
    batch: Dict[str, jax.Array],
    cfg_rate: Optional[float] = None,
    inst_frac: float = 0.25,
    adaptive_p: float = 0.75,
    target: str = "integral",
    teacher_substeps: int = 4,
    streaming: bool = False,
) -> jax.Array:
    """CosyVoice2 wrapper: the causal estimator distills through the same
    core loss (it shares conditional_decoder, causal=True).  Conditioning is
    sampled like flow2_forward_train (50% prompt dropout, U(0, 0.3) prompt
    length — models/flow2.py:126-131) so the student's u covers the
    zero-shot prompted serving patterns; no mel normalization (CosyVoice2
    trains on raw mel).  ``streaming`` runs the chunked-causal attention
    variant — the caller draws it 50/50 per step like flow2_forward_train,
    so the student also covers the chunked windows pipeline2's streaming
    serving runs it under."""
    from ..models.flow2 import flow2_encode

    token = batch["speech_token"]
    token_len = batch["speech_token_len"].astype(jnp.int32)
    feat = batch["speech_feat"]
    feat_len = batch["speech_feat_len"].astype(jnp.int32)
    B, T, _ = feat.shape

    tpv = P(teacher)
    spk = dense(tpv, "spk_embed_affine_layer",
                _l2_normalize(batch["embedding"], axis=1), EVAL)
    h = flow2_encode(tpv, cfg, token, token_len, EVAL, streaming=streaming)
    if h.shape[1] < T:
        h = jnp.pad(h, ((0, 0), (0, T - h.shape[1]), (0, 0)))
    else:
        h = h[:, :T]
    h = jax.lax.stop_gradient(h)
    spk = jax.lax.stop_gradient(spk)

    k_cond, k_len, k_core = jax.random.split(rng, 3)
    drop = jax.random.bernoulli(k_cond, 0.5, (B,))
    plen = (jax.random.uniform(k_len, (B,)) * 0.3 * feat_len).astype(jnp.int32)
    plen = jnp.where(drop, 0, plen)
    idx = jnp.arange(T)[None, :]
    conds = jnp.where((idx < plen[:, None])[:, :, None], feat,
                      0.0).transpose(0, 2, 1).astype(h.dtype)

    h_len = token_len * cfg.token_mel_ratio
    mask = M.make_non_pad_mask(jnp.minimum(h_len, feat_len), T)[:, None, :].astype(h.dtype)
    student = {**teacher, **student_est}
    return meanflow_distill_loss(
        student, teacher, cfg, k_core, feat.transpose(0, 2, 1), mask,
        h.transpose(0, 2, 1), spk, conds, cfg_rate=cfg_rate,
        inst_frac=inst_frac, adaptive_p=adaptive_p, target=target,
        teacher_substeps=teacher_substeps, causal=True,
        streaming=streaming,
        static_chunk_size=cfg.decoder_static_chunk_size)


# ---------------------------------------------------------------------------
# Distiller (training loop)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DistillState:
    student: Params
    opt_state: Any
    step: int = 0


class FlowDistiller:
    """Distills a (merged-finetune) flow model into a few-step MeanFlow
    sampler.  Trains the estimator subtree only; encoder/regulator stay the
    frozen teacher's (they run once per utterance, not per ODE step — all
    the sampling cost is in the estimator)."""

    def __init__(
        self,
        cfg: FlowConfig,
        flow_params: Params,
        lr: float = 1e-5,
        cfg_rate: Optional[float] = None,
        inst_frac: float = 0.25,
        adaptive_p: float = 0.75,
        target: str = "integral",
        teacher_substeps: int = 4,
        family: str = "v1",  # "v1" (FlowConfig) | "cv2" (Flow2Config, causal)
        mel_norm: Tuple[float, float] = (-6.0, 2.0),
        seed: int = 0,
        prng_impl: str = "rbg",
    ):
        self.cfg = cfg
        self.teacher = flow_params
        self.cfg_rate = cfg_rate
        self.inst_frac = inst_frac
        self.adaptive_p = adaptive_p
        self.target = target
        self.teacher_substeps = teacher_substeps
        self.family = family
        self.mel_norm = mel_norm
        self.rng = root_key(seed, prng_impl)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=1e-4),
        )
        self._step_fn = None

    def init_state(self) -> DistillState:
        branched = add_meanflow_time_branch(
            self.teacher, self.cfg.estimator, jax.random.fold_in(self.rng, 7))
        # fresh buffers: the student is donated by the jitted step, so it
        # must not alias the frozen teacher's arrays
        student = {k: jnp.array(v, copy=True)
                   for k, v in student_subset(branched).items()}
        return DistillState(student=student,
                            opt_state=self.optimizer.init(student))

    def _build_step(self):
        cfg, mel_norm = self.cfg, self.mel_norm
        cfg_rate, inst_frac = self.cfg_rate, self.inst_frac
        adaptive_p, target = self.adaptive_p, self.target
        teacher_substeps, family = self.teacher_substeps, self.family
        optimizer = self.optimizer

        def train_step(student, opt_state, teacher, batch, rng,
                       streaming=False):
            def loss_fn(st):
                if family == "cv2":
                    return flow2_distill_loss(st, teacher, cfg, rng, batch,
                                              cfg_rate, inst_frac, adaptive_p,
                                              target, teacher_substeps,
                                              streaming=streaming)
                return flow_distill_loss(st, teacher, cfg, rng, batch,
                                         mel_norm, cfg_rate, inst_frac,
                                         adaptive_p, target, teacher_substeps)

            loss, grads = jax.value_and_grad(loss_fn)(student)
            updates, opt_state = optimizer.update(grads, opt_state, student)
            student = optax.apply_updates(student, updates)
            return student, opt_state, loss

        return jax.jit(train_step, donate_argnums=(0, 1),
                       static_argnames=("streaming",))

    def step(self, state: DistillState, batch: Dict[str, np.ndarray]) -> float:
        if self._step_fn is None:
            self._step_fn = self._build_step()
        rng = jax.random.fold_in(self.rng, state.step)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        # CV2: draw the 50/50 streaming flag on the host per step (two
        # cached programs), exactly like flow2_forward_train's contract —
        # serving runs the student under chunked-causal attention in its
        # streaming windows, so the distillation must cover both modes
        streaming = self.family == "cv2" and state.step % 2 == 1
        state.student, state.opt_state, loss = self._step_fn(
            state.student, state.opt_state, self.teacher, batch, rng,
            streaming=streaming)
        state.step += 1
        return loss  # device scalar; callers batch the fetch

    def fit(self, batches: Iterable[Dict[str, np.ndarray]], steps: int,
            log_every: int = 20) -> DistillState:
        state = self.init_state()
        pending = []
        it = iter(batches)
        while state.step < steps:
            try:
                batch = next(it)
            except StopIteration:
                it = iter(batches)
                try:
                    batch = next(it)
                except StopIteration:
                    # iter() on an exhausted generator returns the same
                    # exhausted generator — a finite generator cannot be
                    # cycled; fail with the reason instead of a bare
                    # StopIteration out of the loop
                    raise ValueError(
                        "batches exhausted before reaching the step count "
                        "and cannot be restarted (pass a list or a "
                        "restartable/endless iterable)") from None
            pending.append(self.step(state, batch))
            if state.step % log_every == 0 or state.step == steps:
                vals = np.asarray(jnp.stack(pending))  # one fetch
                print(f"distill step {state.step}/{steps} "
                      f"loss {float(vals[-1]):.4f} "
                      f"(mean {float(vals.mean()):.4f})")
                pending = []
        return state

    def export(self, state: DistillState, path: str) -> Params:
        """Full flow param dict with the distilled estimator merged in,
        saved torch-format (loadable by compat.load_torch_checkpoint and by
        flow_inference(sampler='meanflow'))."""
        merged = {**self.teacher, **state.student}
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_torch_checkpoint(merged, path)
        from ..params import save_weight_meta

        # v1 distillation runs in normalized mel space (flow_distill_loss
        # mirrors the fine-tune loss); CV2 trains in raw mel like its own
        # flow — record it so serving picks the right denorm default
        save_weight_meta(
            path,
            mel_space="normalized" if self.family == "v1" else "raw",
            producer="cosy_tpu.distill", sampler="meanflow")
        return merged


__all__ = [
    "add_meanflow_time_branch", "student_subset", "meanflow_distill_loss",
    "flow_distill_loss", "flow2_distill_loss", "FlowDistiller", "DistillState",
    "cfm_solve_mean", "cfm_solve_euler",
]
