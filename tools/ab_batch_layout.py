"""A/B: bs1 x accum16 (reference layout) vs bs8 x accum2 (TPU layout) joint
LoRA training — trajectory equivalence through the PRODUCTION trainer.

The reference trains at bs1 x grad-accum 16 because it targets an 8 GB GPU
(reference config.py:219-224 documents the VRAM budget); bench.py proves the
same effective batch folded as bs8 x accum2 is ~1.6x faster per optimizer
step on TPU (BENCH_r04: 131.4 vs 80.5 ms).  Before flipping the training
default, this tool checks the two layouts actually train equivalently
(VERDICT r4 next #3).

Protocol: identical 300M-topology init, identical synthetic dataset with
VARYING sample lengths (so the one honest semantic difference — per-micro
length-normalized loss weighting — is exercised, not hidden), identical
sample order per optimizer step (step s consumes samples [16s..16s+16),
arm A shaped (16, 1, ...), arm B shaped (2, 8, ...)), identical per-step
trainer rng.  Both arms run JointTrainer.step (the real jitted
scan-accumulated path, bf16) for STEPS steps; every EVAL_EVERY steps both
are scored with JointTrainer.evaluate on the SAME held-out set in the SAME
layout, so the comparison metric is layout-independent.

Equivalence gate: mean |rel diff| of the eval-loss curves < 2% and the
final eval gap < 2%.  Writes tools/ab_batch_layout_result.json.

Run on the real chip (~10 min, two step-program compiles):
    python tools/ab_batch_layout.py
CPU smoke: AB_PLATFORM=cpu AB_STEPS=4 AB_SCALE=tiny python tools/ab_batch_layout.py
"""

import json
import os
import sys
import time

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")  # stale cross-host AOT blobs are a SIGILL risk

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "."))

import jax

if os.environ.get("AB_PLATFORM"):  # e.g. AB_PLATFORM=cpu for the smoke run
    # env JAX_PLATFORMS alone can lose to the sitecustomize pre-import
    jax.config.update("jax_platforms", os.environ["AB_PLATFORM"])
import jax.numpy as jnp

from cosy_tpu.config import ModelConfig, TrainConfig, replace
from cosy_tpu.models import flow as F, llm as L
from cosy_tpu.train.trainer import JointTrainer
from cosy_tpu.ctx import root_key

STEPS = int(os.environ.get("AB_STEPS", 40))
EVAL_EVERY = int(os.environ.get("AB_EVAL_EVERY", 5))
EFF = 16  # effective batch per optimizer step, both arms
Tt, Ts, Tm = 32, 144, 248


def make_cfgs():
    mcfg = ModelConfig()
    if os.environ.get("AB_SCALE") == "tiny":
        from cosy_tpu.config import EncoderConfig, EstimatorConfig

        enc = lambda d, ff, n, **kw: EncoderConfig(  # noqa: E731
            input_size=d, output_size=d, attention_heads=2, linear_units=ff,
            num_blocks=n, **kw)
        mcfg = replace(
            mcfg,
            llm=replace(mcfg.llm, text_encoder_input_size=64, llm_input_size=64,
                        llm_output_size=64, text_token_size=100,
                        speech_token_size=50,
                        text_encoder=enc(64, 128, 1, input_layer="linear",
                                         static_chunk_size=1),
                        llm=enc(64, 128, 2, input_layer="linear_legacy",
                                static_chunk_size=1)),
            flow=replace(mcfg.flow, input_size=64, vocab_size=50,
                         encoder=enc(64, 128, 1),
                         estimator=replace(mcfg.flow.estimator, channels=(32,),
                                           in_channels=320, n_blocks=1,
                                           num_mid_blocks=1, num_heads=2,
                                           attention_head_dim=16)),
        )
    return mcfg


def make_data(mcfg, n=64, seed=7):
    """n samples with varying valid lengths under static padded shapes —
    the real collate contract (data/dataset.py)."""
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        tl = int(rng.integers(Tt // 2, Tt + 1))
        sl = int(rng.integers(Ts // 2, Ts + 1))
        ml = min(Tm, max(8, int(sl * 248 / 144)))
        ml -= ml % 2
        rows.append({
            "text_token": rng.integers(0, min(1000, mcfg.llm.text_token_size), Tt).astype(np.int32),
            "text_token_len": np.int32(tl),
            "speech_token": rng.integers(0, mcfg.flow.vocab_size, Ts).astype(np.int32),
            "speech_token_len": np.int32(sl),
            "speech_feat": (rng.standard_normal((Tm, 80)) * 2 - 6).astype(np.float32),
            "speech_feat_len": np.int32(ml),
            "embedding": rng.standard_normal(192).astype(np.float32),
        })
    return rows


def shape_super(rows, accum, B):
    out = {}
    for k in rows[0]:
        stacked = np.stack([np.asarray(r[k]) for r in rows])  # (EFF, ...)
        out[k] = jnp.asarray(stacked.reshape((accum, B) + stacked.shape[1:]))
    return out


def run_arm(mcfg, base_params, accum, B, train_rows, eval_batches, ev_tr,
            label):
    tcfg = replace(TrainConfig(), batch_size=B, accumulate_grad_batches=accum,
                   scheduler="warmup_cosine", warmup_steps=4)
    tr = JointTrainer(mcfg, tcfg, dict(base_params[0]), dict(base_params[1]),
                      out_dir="/tmp/ab_layout", total_steps=STEPS)
    state = tr.init_state(jax.random.PRNGKey(100))  # same init both arms
    evals, train_losses = [], []
    t0 = time.time()
    for s in range(STEPS):
        rows = [train_rows[(s * EFF + i) % len(train_rows)] for i in range(EFF)]
        sb = shape_super(rows, accum, B)
        rng = jax.random.fold_in(root_key(0, tcfg.prng_impl), s)
        m = tr.step(state, sb, rng)
        train_losses.append(float(m["loss"]))
        if (s + 1) % EVAL_EVERY == 0 or s == STEPS - 1:
            # scored through the SHARED eval trainer (one fixed accum x B
            # layout), so the comparison metric is layout-independent —
            # evaluate()'s micro split must match ITS OWN accum, not the
            # arm's (trainer.py:184)
            ev = ev_tr.evaluate(iter(eval_batches), state)
            evals.append((s + 1, float(ev["cv_loss"])))
            print(f"[{label}] step {s+1}: train {train_losses[-1]:.4f} "
                  f"eval {evals[-1][1]:.4f} ({time.time()-t0:.0f}s)", flush=True)
    return evals, train_losses


def main():
    mcfg = make_cfgs()
    key = jax.random.PRNGKey(0)
    llm_p = jax.jit(lambda k: L.init_llm_params(k, mcfg.llm))(key)
    flow_p = jax.jit(lambda k: F.init_flow_params(k, mcfg.flow))(
        jax.random.fold_in(key, 1))
    train_rows = make_data(mcfg, 64, seed=7)
    # held-out eval set, ONE shared layout (accum 4 x B 2) for both arms
    eval_rows = make_data(mcfg, 16, seed=99)
    eval_batches = [shape_super(eval_rows[i:i + 8], 4, 2)
                    for i in range(0, 16, 8)]
    ev_tr = JointTrainer(
        mcfg, replace(TrainConfig(), batch_size=2, accumulate_grad_batches=4),
        dict(llm_p), dict(flow_p), out_dir="/tmp/ab_layout", total_steps=STEPS)

    evals_ref, tl_ref = run_arm(mcfg, (llm_p, flow_p), 16, 1, train_rows,
                                eval_batches, ev_tr, "bs1xaccum16")
    evals_tpu, tl_tpu = run_arm(mcfg, (llm_p, flow_p), 2, 8, train_rows,
                                eval_batches, ev_tr, "bs8xaccum2")

    gaps = [abs(a[1] - b[1]) / max(1e-9, abs(a[1]))
            for a, b in zip(evals_ref, evals_tpu)]
    mean_gap, final_gap = float(np.mean(gaps)), float(gaps[-1])
    ok = mean_gap < 0.02 and final_gap < 0.02
    out = {
        "ok": bool(ok), "steps": STEPS, "effective_batch": EFF,
        "eval_steps": [s for s, _ in evals_ref],
        "eval_loss_bs1xaccum16": [v for _, v in evals_ref],
        "eval_loss_bs8xaccum2": [v for _, v in evals_tpu],
        "train_loss_bs1xaccum16": tl_ref,
        "train_loss_bs8xaccum2": tl_tpu,
        "mean_rel_gap": mean_gap, "final_rel_gap": final_gap,
        "gate": "mean<2% and final<2%",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ab_batch_layout_result.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"AB BATCH LAYOUT {'OK' if ok else 'FAILED'} "
          f"mean_gap={mean_gap:.4f} final_gap={final_gap:.4f} -> {path}")
    os._exit(0 if ok else 1)


if __name__ == "__main__":
    main()
