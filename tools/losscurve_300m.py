"""Loss-curve parity: flow-only LoRA fine-tuning, torch reference vs cosy_tpu.

The real CosyVoice-300M checkpoint and poem-clip parquet data do not ship in
this image (BASELINE.md's 8.2->0.6 curve is not reproducible bit-for-bit
without them), so the strongest available check is run instead: both stacks
train the SAME seeded 300M-topology init on the SAME synthetic dataset at the
reference's poem-clip shapes (bs 1 x accum, seq<=250 — config.py:219-224),
with the three stochastic draws of compute_loss injected identically per
micro-step, the same AdamW(0.9, 0.999, wd) and the same warmup-cosine lr.
The two loss trajectories must then agree point-by-point to numerical
precision — stricter than curve-shape parity.

Writes tools/losscurve_300m_result.json (both curves + divergence).
Run: python tools/losscurve_300m.py   (~10 min CPU)
"""

import importlib.machinery
import json
import os

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")  # stale cross-host AOT cache is a SIGILL risk
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import torch


def _stub(name, **attrs):
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m


for mod in ("torchaudio", "torchaudio.compliance", "torchaudio.compliance.kaldi",
            "onnxruntime", "whisper", "inflect", "diffusers", "conformer",
            "lightning", "pytorch_lightning", "gdown", "wget"):
    _stub(mod)
_stub("librosa")
_stub("librosa.filters", mel=lambda **kw: np.zeros((80, 513)))
_stub("omegaconf", DictConfig=dict)
sys.path.insert(0, "/root/reference/cosyvoice_flow_finetune")

STEPS = int(os.environ.get("LC_STEPS", 16))
ACCUM = int(os.environ.get("LC_ACCUM", 4))
WARMUP = 4
LR, MIN_LR, WD = 2e-4, 1e-6, 0.01
B, T_MEL, T_TOK = 1, 224, 130

torch.manual_seed(20260816)
from flow_model import build_flow_model  # noqa: E402
import lora as ref_lora  # noqa: E402

flow_t = build_flow_model(pretrained_path=None, device="cpu").eval().float()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from cosy_tpu.config import ModelConfig, TrainConfig, replace  # noqa: E402
from cosy_tpu.ctx import Ctx  # noqa: E402
from cosy_tpu.lora import init_lora  # noqa: E402
from cosy_tpu.models.flow import flow_forward_train  # noqa: E402
from cosy_tpu.params import P  # noqa: E402
from cosy_tpu.train.schedules import warmup_cosine  # noqa: E402

tcfg = TrainConfig()
flow_cfg = replace(ModelConfig().flow, encoder_xscale=False)  # L4 conformer

ref_lora.apply_lora_to_model(
    flow_t, r=tcfg.flow_lora.r, lora_alpha=tcfg.flow_lora.alpha,
    lora_dropout=0.0, target_modules=list(tcfg.flow_lora.target_modules))

# shared param state: export torch (base + lora init) into jax
import tempfile  # noqa: E402

from cosy_tpu.params import load_torch_checkpoint  # noqa: E402

tmp = tempfile.mkdtemp()
base_sd = {k: v for k, v in flow_t.state_dict().items() if "lora_" not in k}
torch.save({k.replace(".original_layer", ""): v for k, v in base_sd.items()},
           os.path.join(tmp, "flow.pt"))
flow_p = load_torch_checkpoint(os.path.join(tmp, "flow.pt"))

lora_j = init_lora(jax.random.PRNGKey(5), flow_p, tcfg.flow_lora)
with torch.no_grad():
    named = dict(flow_t.named_parameters())
    for k, v in lora_j.items():
        tk = k.replace(".lora_A.weight", ".lora_A").replace(".lora_B.weight", ".lora_B")
        tk = tk if tk in named else k
        # torch path includes .original_layer for wrapped modules' base weight
        assert tk in named, tk
        named[tk].copy_(torch.tensor(np.asarray(v)))

# dataset + per-microstep noise, pre-drawn once
rng = np.random.default_rng(42)
N = 8
data = []
for _ in range(N):
    data.append({
        "speech_token": rng.integers(0, 4096, (B, T_TOK)).astype(np.int64),
        "speech_token_len": np.full((B,), T_TOK, np.int64),
        "speech_feat": (rng.standard_normal((B, T_MEL, 80)) * 2.0 - 6.0).astype(np.float32),
        "speech_feat_len": np.full((B,), T_MEL, np.int64),
        "embedding": rng.standard_normal((B, 192)).astype(np.float32),
    })
noises = [(rng.random((B, 1, 1)).astype(np.float32),
           rng.standard_normal((B, 80, T_MEL)).astype(np.float32),
           rng.random(B).astype(np.float32))
          for _ in range(STEPS * ACCUM)]

sched = warmup_cosine(LR, MIN_LR, WARMUP, STEPS)

# ---- torch loop -----------------------------------------------------------
lora_params_t = [p for n, p in flow_t.named_parameters() if "lora_" in n]
for n, p in flow_t.named_parameters():
    p.requires_grad = "lora_" in n
opt_t = torch.optim.AdamW(lora_params_t, lr=LR, weight_decay=WD, betas=(0.9, 0.999))

_orig = (torch.rand, torch.randn_like)
_cur = {}


def _fake_rand(*shape, **kw):
    if shape and isinstance(shape[0], (list, tuple)):
        shape = tuple(shape[0])
    if shape == (B, 1, 1):
        return torch.tensor(_cur["t"])
    if shape == (B,):
        return torch.tensor(_cur["cfg"])
    return _orig[0](*shape, **kw)


curve_t = []
t0 = time.time()
torch.rand = _fake_rand
torch.randn_like = lambda x, **kw: torch.tensor(_cur["z"]).to(x.dtype)
micro = 0
for step in range(STEPS):
    opt_t.zero_grad()
    acc = 0.0
    for a in range(ACCUM):
        s = data[micro % N]
        _cur["t"], _cur["z"], _cur["cfg"] = noises[micro]
        feat_norm = (torch.tensor(s["speech_feat"]) + 6.0) / 2.0
        out = flow_t._forward_no_prompt(
            torch.tensor(s["speech_token"]), torch.tensor(s["speech_token_len"]),
            feat_norm, torch.tensor(s["speech_feat_len"]),
            torch.tensor(s["embedding"]), torch.device("cpu"), torch.float32)
        (out["loss"] / ACCUM).backward()
        acc += float(out["loss"].detach())
        micro += 1
    lr_now = float(sched(step))
    for g in opt_t.param_groups:
        g["lr"] = lr_now
    torch.nn.utils.clip_grad_norm_(lora_params_t, 1.0)
    opt_t.step()
    curve_t.append(acc / ACCUM)
    print(f"torch step {step}: loss={curve_t[-1]:.5f} ({time.time()-t0:.0f}s)",
          flush=True)
torch.rand, torch.randn_like = _orig

# ---- jax loop --------------------------------------------------------------
opt_j = optax.chain(optax.clip_by_global_norm(1.0),
                    optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=WD))
opt_state = opt_j.init(lora_j)


def loss_fn(lora, batch, noise):
    ctx = Ctx(rng=jax.random.PRNGKey(0), train=False, lora=lora,
              lora_scale=tcfg.flow_lora.scaling, lora_dropout=0.0)
    return flow_forward_train(P(flow_p), flow_cfg, jax.random.PRNGKey(0),
                              batch, ctx, no_prompt=True, noise=noise)


grad_fn = jax.jit(jax.value_and_grad(loss_fn))


@jax.jit
def apply(lora, opt_state, grads, step):
    updates, opt_state = opt_j.update(grads, opt_state, lora)
    return optax.apply_updates(lora, updates), opt_state


curve_j = []
t0 = time.time()
micro = 0
for step in range(STEPS):
    gsum = jax.tree.map(jnp.zeros_like, lora_j)
    acc = 0.0
    for a in range(ACCUM):
        s = data[micro % N]
        batch = {k: jnp.asarray(v, jnp.int32 if v.dtype == np.int64 else jnp.float32)
                 for k, v in s.items()}
        loss, g = grad_fn(lora_j, batch, tuple(jnp.asarray(x) for x in noises[micro]))
        gsum = jax.tree.map(lambda a_, b_: a_ + b_ / ACCUM, gsum, g)
        acc += float(loss)
        micro += 1
    lora_j, opt_state = apply(lora_j, opt_state, gsum, step)
    curve_j.append(acc / ACCUM)
    print(f"jax   step {step}: loss={curve_j[-1]:.5f} ({time.time()-t0:.0f}s)",
          flush=True)

diffs = [abs(a - b) for a, b in zip(curve_t, curve_j)]
rel = max(diffs) / max(1e-9, max(curve_t))
ok = rel < 5e-3 and curve_j[-1] < curve_j[0]
out_path = os.path.join(os.path.dirname(__file__), "losscurve_300m_result.json")
json.dump({"ok": bool(ok), "steps": STEPS, "accum": ACCUM,
           "torch_curve": curve_t, "jax_curve": curve_j,
           "max_abs_diff": max(diffs), "max_rel_diff": rel},
          open(out_path, "w"), indent=1)
print(("LOSSCURVE 300M OK" if ok else "LOSSCURVE 300M FAILED") +
      f" max_rel_diff={rel:.2e} first={curve_j[0]:.4f} last={curve_j[-1]:.4f}")
sys.exit(0 if ok else 1)
