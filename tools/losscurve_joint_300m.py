"""Loss-curve parity for the FLAGSHIP path: joint LLM+Flow LoRA training.

Same protocol as tools/losscurve_300m.py but for the joint objective
(reference llm_flow_model.py:77-229 + train_joint.py): both stacks train
identical 300M-topology inits on identical data with loss =
2.0 * llm_ce + flow_cfm, LoRA on both submodels (llm r8/a16, flow r16/a32),
AdamW + global clip 1.0 + warmup-cosine, and the flow loss's three random
draws injected identically per micro-step.  The LLM CE is deterministic
(dropout off both sides), so the joint trajectories must agree pointwise.

Writes tools/losscurve_joint_300m_result.json.
Run: python tools/losscurve_joint_300m.py   (~20 min CPU)
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
            "onnxruntime", "whisper", "inflect", "diffusers", "lightning",
            "pytorch_lightning", "gdown", "wget", "vllm"):
    _stub(mod)
_stub("librosa")
_stub("librosa.filters", mel=lambda **kw: np.zeros((80, 513)))
_stub("omegaconf", DictConfig=dict)
_stub("conformer", ConformerBlock=object)
sys.path.insert(0, "/root/reference/cosyvoice_flow_finetune")

STEPS = int(os.environ.get("LC_STEPS", 8))
ACCUM = int(os.environ.get("LC_ACCUM", 2))
WARMUP = 2
LR, MIN_LR, WD = 2e-4, 1e-6, 0.01
B, T_MEL, T_TOK, T_TXT = 1, 160, 93, 12
LLM_W = 2.0  # llm_loss_weight (config.py:219-224)

torch.manual_seed(20260816)
from flow_model import build_flow_model  # noqa: E402
import lora as ref_lora  # noqa: E402

flow_t = build_flow_model(pretrained_path=None, device="cpu").eval().float()

from cosyvoice.transformer.encoder import ConformerEncoder, TransformerEncoder  # noqa: E402
from cosyvoice.llm.llm import TransformerLM  # noqa: E402

text_enc_t = ConformerEncoder(
    input_size=512, output_size=1024, attention_heads=16, linear_units=4096,
    num_blocks=6, dropout_rate=0.1, positional_dropout_rate=0.1,
    attention_dropout_rate=0.0, normalize_before=True, input_layer="linear",
    pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
    use_cnn_module=False, macaron_style=False, static_chunk_size=1)
llm_enc_t = TransformerEncoder(
    input_size=1024, output_size=1024, attention_heads=16, linear_units=4096,
    num_blocks=14, dropout_rate=0.1, positional_dropout_rate=0.1,
    attention_dropout_rate=0.0, input_layer="linear_legacy",
    pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
    static_chunk_size=1)
llm_t = TransformerLM(
    text_encoder_input_size=512, llm_input_size=1024, llm_output_size=1024,
    text_token_size=60515, speech_token_size=4096, text_encoder=text_enc_t,
    llm=llm_enc_t, sampling=None, length_normalized_loss=True, lsm_weight=0.0,
    spk_embed_dim=192).eval().float()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from cosy_tpu.config import ModelConfig, TrainConfig, replace  # noqa: E402
from cosy_tpu.ctx import Ctx  # noqa: E402
from cosy_tpu.lora import init_lora  # noqa: E402
from cosy_tpu.models.flow import flow_forward_train  # noqa: E402
from cosy_tpu.models.llm import llm_forward_train  # noqa: E402
from cosy_tpu.params import P, load_torch_checkpoint  # noqa: E402
from cosy_tpu.train.schedules import warmup_cosine  # noqa: E402

tcfg = TrainConfig()
mcfg = ModelConfig()
flow_cfg = replace(mcfg.flow, encoder_xscale=False)  # L4 conformer semantics

ref_lora.apply_lora_to_model(
    flow_t, r=tcfg.flow_lora.r, lora_alpha=tcfg.flow_lora.alpha,
    lora_dropout=0.0, target_modules=list(tcfg.flow_lora.target_modules))
ref_lora.apply_lora_to_model(
    llm_t, r=tcfg.llm_lora.r, lora_alpha=tcfg.llm_lora.alpha,
    lora_dropout=0.0, target_modules=list(tcfg.llm_lora.target_modules))

import tempfile  # noqa: E402

tmp = tempfile.mkdtemp()


def export_base(model, name):
    sd = {k.replace(".original_layer", ""): v
          for k, v in model.state_dict().items() if "lora_" not in k}
    torch.save(sd, os.path.join(tmp, name))
    return load_torch_checkpoint(os.path.join(tmp, name))


flow_p = export_base(flow_t, "flow.pt")
llm_p = export_base(llm_t, "llm.pt")

loras = {"llm": init_lora(jax.random.PRNGKey(4), llm_p, tcfg.llm_lora),
         "flow": init_lora(jax.random.PRNGKey(5), flow_p, tcfg.flow_lora)}
with torch.no_grad():
    for model, key in ((llm_t, "llm"), (flow_t, "flow")):
        named = dict(model.named_parameters())
        for k, v in loras[key].items():
            tk = k.replace(".lora_A.weight", ".lora_A").replace(".lora_B.weight", ".lora_B")
            tk = tk if tk in named else k
            assert tk in named, (key, tk)
            named[tk].copy_(torch.tensor(np.asarray(v)))

rng = np.random.default_rng(42)
N = 6
data = []
for _ in range(N):
    data.append({
        "text_token": rng.integers(0, 60515, (B, T_TXT)).astype(np.int64),
        "text_token_len": np.full((B,), T_TXT, np.int64),
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

# ---- torch loop -------------------------------------------------------------
lora_params_t = [p_ for m in (llm_t, flow_t)
                 for n, p_ in m.named_parameters() if "lora_" in n]
for m in (llm_t, flow_t):
    for n, p_ in m.named_parameters():
        p_.requires_grad = "lora_" in n
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
        tb = {k: torch.tensor(v) for k, v in s.items()}
        llm_out = llm_t(tb, torch.device("cpu"))
        feat_norm = (torch.tensor(s["speech_feat"]) + 6.0) / 2.0
        flow_out = flow_t._forward_no_prompt(
            tb["speech_token"], tb["speech_token_len"], feat_norm,
            tb["speech_feat_len"], tb["embedding"], torch.device("cpu"),
            torch.float32)
        loss = LLM_W * llm_out["loss"] + flow_out["loss"]
        (loss / ACCUM).backward()
        acc += float(loss.detach())
        micro += 1
    lr_now = float(sched(step))
    for g in opt_t.param_groups:
        g["lr"] = lr_now
    torch.nn.utils.clip_grad_norm_(lora_params_t, 1.0)
    opt_t.step()
    curve_t.append(acc / ACCUM)
    print(f"torch step {step}: joint={curve_t[-1]:.5f} ({time.time()-t0:.0f}s)",
          flush=True)
torch.rand, torch.randn_like = _orig
del llm_t, flow_t

# ---- jax loop ----------------------------------------------------------------
opt_j = optax.chain(optax.clip_by_global_norm(1.0),
                    optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=WD))
opt_state = opt_j.init(loras)


def loss_fn(lo, batch, noise):
    lctx = Ctx(rng=jax.random.PRNGKey(0), train=False, lora=lo["llm"],
               lora_scale=tcfg.llm_lora.scaling, lora_dropout=0.0)
    res = llm_forward_train(P(llm_p), mcfg.llm, batch, lctx)
    fctx = Ctx(rng=jax.random.PRNGKey(0), train=False, lora=lo["flow"],
               lora_scale=tcfg.flow_lora.scaling, lora_dropout=0.0)
    fl = flow_forward_train(P(flow_p), flow_cfg, jax.random.PRNGKey(0), batch,
                            fctx, no_prompt=True, noise=noise)
    return LLM_W * res["loss"] + fl


grad_fn = jax.jit(jax.value_and_grad(loss_fn))


@jax.jit
def apply(lo, opt_state, grads, step):
    updates, opt_state = opt_j.update(grads, opt_state, lo)
    return optax.apply_updates(lo, updates), opt_state


curve_j = []
t0 = time.time()
micro = 0
for step in range(STEPS):
    gsum = jax.tree.map(jnp.zeros_like, loras)
    acc = 0.0
    for a in range(ACCUM):
        s = data[micro % N]
        batch = {k: jnp.asarray(v, jnp.int32 if v.dtype == np.int64 else jnp.float32)
                 for k, v in s.items()}
        loss, g = grad_fn(loras, batch, tuple(jnp.asarray(x) for x in noises[micro]))
        gsum = jax.tree.map(lambda a_, b_: a_ + b_ / ACCUM, gsum, g)
        acc += float(loss)
        micro += 1
    loras, opt_state = apply(loras, opt_state, gsum, step)
    curve_j.append(acc / ACCUM)
    print(f"jax   step {step}: joint={curve_j[-1]:.5f} ({time.time()-t0:.0f}s)",
          flush=True)

diffs = [abs(a - b) for a, b in zip(curve_t, curve_j)]
rel = max(diffs) / max(1e-9, max(curve_t))
ok = rel < 5e-3
out_path = os.path.join(os.path.dirname(__file__), "losscurve_joint_300m_result.json")
json.dump({"ok": bool(ok), "steps": STEPS, "accum": ACCUM,
           "torch_curve": curve_t, "jax_curve": curve_j,
           "max_abs_diff": max(diffs), "max_rel_diff": rel},
          open(out_path, "w"), indent=1)
print(("LOSSCURVE JOINT 300M OK" if ok else "LOSSCURVE JOINT 300M FAILED") +
      f" max_rel_diff={rel:.2e} first={curve_j[0]:.4f} last={curve_j[-1]:.4f}")
sys.exit(0 if ok else 1)
