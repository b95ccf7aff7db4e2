"""Full-topology (CosyVoice-300M scale) activation parity vs the reference.

Builds the reference torch models at the exact 300M topology with seeded
random weights (no pretrained checkpoint ships in this image), saves them as
``.pt``, loads them through ``cosy_tpu.compat`` (the production load path),
and asserts per-module activation parity:

  flow:  input_embedding->encoder->proj | length regulator | U-Net estimator
         | full CFG Euler solve          (reference flow_model.py:641-767)
  llm:   full TransformerLM training forward (loss + acc)
         (reference cosyvoice/llm/llm.py:32-145)

Writes tools/parity_300m_result.json.  Run:
    env JAX_PLATFORMS=cpu python tools/parity_300m.py
"""

import importlib.machinery
import json
import os

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")  # stale cross-host AOT cache is a SIGILL risk
import sys
import tempfile
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
            "onnxruntime", "whisper", "inflect", "diffusers", "diffusers.models",
            "conformer", "lightning", "pytorch_lightning", "gdown", "wget"):
    _stub(mod)
_stub("librosa")
_stub("librosa.filters", mel=lambda **kw: np.zeros((80, 513)))
_stub("omegaconf", DictConfig=dict)
sys.path.insert(0, "/root/reference/cosyvoice_flow_finetune")

torch.manual_seed(20260816)
REPORT = {}


def check(name, got, want, tol):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    denom = max(1e-9, float(np.max(np.abs(want))))
    err = float(np.max(np.abs(got - want))) / denom
    REPORT[name] = {"rel_err": err, "tol": tol, "ok": err < tol,
                    "ref_scale": denom}
    status = "OK " if err < tol else "FAIL"
    print(f"[{status}] {name}: rel_err={err:.3e} (tol {tol})", flush=True)


# ---------------------------------------------------------------------------
# Flow at full topology
# ---------------------------------------------------------------------------
t0 = time.time()
from flow_model import build_flow_model  # noqa: E402  (reference L4 builder)

flow_t = build_flow_model(pretrained_path=None, device="cpu").eval().float()
n_flow = sum(p.numel() for p in flow_t.parameters())
print(f"reference flow built: {n_flow/1e6:.1f}M params ({time.time()-t0:.0f}s)")

tmp = tempfile.mkdtemp()
torch.save(flow_t.state_dict(), os.path.join(tmp, "flow.pt"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # wins over sitecustomize pre-import
import jax.numpy as jnp  # noqa: E402

from cosy_tpu.config import ModelConfig  # noqa: E402
from cosy_tpu.ctx import EVAL  # noqa: E402
from cosy_tpu.params import P, load_torch_checkpoint  # noqa: E402
from cosy_tpu.models import flow as F  # noqa: E402
from cosy_tpu.models import llm as L  # noqa: E402
from cosy_tpu.layers.unet import conditional_decoder  # noqa: E402

assert jax.default_backend() == "cpu", "run with JAX_PLATFORMS=cpu"
cfg = ModelConfig()

flow_p = load_torch_checkpoint(os.path.join(tmp, "flow.pt"))
missing = [k for k, _ in flow_t.state_dict().items() if k not in flow_p]
assert not missing, missing[:5]
print(f"flow checkpoint loaded through compat: {len(flow_p)} tensors")

rng = np.random.default_rng(1)
B, T_tok, T_mel = 2, 60, 104

token = rng.integers(0, 4096, (B, T_tok)).astype(np.int64)
token_len = np.asarray([T_tok, T_tok - 11], np.int64)

# 1. token embed -> conformer encoder -> proj
with torch.no_grad():
    tt = torch.tensor(token)
    tl = torch.tensor(token_len)
    mask_t = (torch.arange(T_tok)[None, :] < tl[:, None]).unsqueeze(-1)
    emb_t = flow_t.input_embedding(torch.clamp(tt, min=0)) * mask_t
    h_t, _ = flow_t.encoder(emb_t, tl)
    h_t = flow_t.encoder_proj(h_t)
# build_flow_model uses the L4 self-contained conformer which omits the
# Espnet x*sqrt(d) scaling (modules.py:382-428); the stock-checkpoint path
# keeps encoder_xscale=True (flow.py + EspnetRelPositionalEncoding)
from cosy_tpu.config import replace as cfg_replace  # noqa: E402

flow_cfg = cfg_replace(cfg.flow, encoder_xscale=False)
h_j = F.flow_encode(P(flow_p), flow_cfg, jnp.asarray(token, jnp.int32),
                    jnp.asarray(token_len, jnp.int32), EVAL)
check("flow.encode", h_j, h_t.numpy(), 2e-4)

# 2. length regulator
with torch.no_grad():
    mel_len = torch.tensor([T_mel, T_mel - 20])
    reg_t, _ = flow_t.length_regulator(h_t, mel_len)
reg_j = F.length_regulator(P(flow_p).sub("length_regulator"), jnp.asarray(h_t.numpy()),
                           jnp.asarray(mel_len.numpy(), jnp.int32), T_mel,
                           cfg.flow.regulator_stages, EVAL)
# torch interpolates each sample to its own length; compare the full-length row
check("flow.regulator", reg_j[0], reg_t[0].numpy(), 2e-4)

# 3. U-Net estimator at fixed t
x = rng.standard_normal((B, 80, T_mel)).astype(np.float32)
mu = rng.standard_normal((B, 80, T_mel)).astype(np.float32)
spks = rng.standard_normal((B, 80)).astype(np.float32)
cond = rng.standard_normal((B, 80, T_mel)).astype(np.float32) * 0.1
mask = np.ones((B, 1, T_mel), np.float32)
tvec = np.asarray([0.3, 0.7], np.float32)
with torch.no_grad():
    est_t = flow_t.decoder.estimator(
        torch.tensor(x), torch.tensor(mask), torch.tensor(mu),
        torch.tensor(tvec), torch.tensor(spks), torch.tensor(cond))
est_j = conditional_decoder(
    P(flow_p).sub("decoder.estimator"), cfg.flow.estimator, jnp.asarray(x),
    jnp.asarray(mask), jnp.asarray(mu), jnp.asarray(tvec), jnp.asarray(spks),
    jnp.asarray(cond), EVAL)
check("flow.estimator", est_j, est_t.numpy(), 5e-4)

# 4. full 10-step CFG Euler solve from a shared z
z = rng.standard_normal((B, 80, T_mel)).astype(np.float32)
nfe = 10
t_span_t = torch.linspace(0, 1, nfe + 1)
t_span_t = 1 - torch.cos(t_span_t * 0.5 * torch.pi)  # cosine scheduler
# reference solve_euler is batch-1 only (flow_model.py:94-125, :492)
with torch.no_grad():
    sol_t = flow_t.decoder.solve_euler(
        torch.tensor(z[:1]), t_span=t_span_t, mu=torch.tensor(mu[:1]),
        mask=torch.tensor(mask[:1]), spks=torch.tensor(spks[:1]),
        cond=torch.tensor(cond[:1]))
sol_j = F.cfm_solve_euler(
    P(flow_p).sub("decoder.estimator"), cfg.flow, jnp.asarray(z[:1]),
    jnp.asarray(mask[:1]), jnp.asarray(mu[:1]), jnp.asarray(spks[:1]),
    jnp.asarray(cond[:1]), nfe, EVAL)
check("flow.euler_solve_nfe10", sol_j, sol_t.numpy(), 2e-3)

# MCD between the two stacks' generated mels (the north-star quality gate,
# BASELINE.md): denormalize both to natural-log mel and measure.  Identical
# z/conditioning means this isolates implementation divergence only.
from cosy_tpu.ops.mcd import mcd  # noqa: E402

mel_j = np.asarray(sol_j)[0].T * 2.0 + (-6.0)  # (T, 80) log-mel
mel_t = sol_t.numpy()[0].T * 2.0 + (-6.0)
mcd_db = mcd(mel_j, mel_t, align=False)
REPORT["flow.mcd_between_stacks_db"] = {"rel_err": mcd_db, "tol": 0.01,
                                        "ok": bool(mcd_db < 0.01)}
print(f"[{'OK ' if mcd_db < 0.01 else 'FAIL'}] flow.mcd_between_stacks_db: "
      f"{mcd_db:.5f} dB (tol 0.01)", flush=True)

# 5. LoRA gradient parity on the full no-prompt flow loss
#    (the fine-tune training path: flow_model.py:402-473 + lora.py, with the
#    three random draws in compute_loss injected identically on both sides)
import lora as ref_lora  # noqa: E402  (reference L4 lora engine)

from cosy_tpu.config import TrainConfig  # noqa: E402
from cosy_tpu.ctx import Ctx  # noqa: E402
from cosy_tpu.lora import init_lora  # noqa: E402
from cosy_tpu.models.joint import joint_forward_train  # noqa: E402

tcfg = TrainConfig()
ref_lora.apply_lora_to_model(
    flow_t, r=tcfg.flow_lora.r, lora_alpha=tcfg.flow_lora.alpha,
    lora_dropout=0.0, target_modules=list(tcfg.flow_lora.target_modules))
flow_lora = init_lora(jax.random.PRNGKey(5), flow_p, tcfg.flow_lora)
with torch.no_grad():
    sd = dict(flow_t.named_parameters())
    for k, v in flow_lora.items():
        tk = k.replace(".lora_A.weight", ".lora_A").replace(".lora_B.weight", ".lora_B") \
            if k.endswith((".lora_A.weight", ".lora_B.weight")) and sd.get(k) is None else k
        assert tk in sd, tk
        sd[tk].copy_(torch.tensor(np.asarray(v)))
n_lora = len(flow_lora)

feat = rng.standard_normal((B, T_mel, 80)).astype(np.float32) * 2.0 - 6.0
feat_len = np.asarray([T_mel, T_mel - 20], np.int64)
spk192 = rng.standard_normal((B, 192)).astype(np.float32)
t_u = rng.random((B, 1, 1)).astype(np.float32)
z_n = rng.standard_normal((B, 80, T_mel)).astype(np.float32)
cfg_u = rng.random(B).astype(np.float32)

flow_t.train(False)
_rand_calls = {"n": 0}
_orig = (torch.rand, torch.randn_like)


def _fake_rand(*shape, **kw):
    if list(shape) in ([ [B, 1, 1] ], [[B, 1, 1]]):
        pass
    if shape and isinstance(shape[0], list):
        shape = tuple(shape[0])
    if shape == (B, 1, 1):
        return torch.tensor(t_u)
    if shape == (B,):
        return torch.tensor(cfg_u)
    return _orig[0](*shape, **kw)


torch.rand = _fake_rand
torch.randn_like = lambda x, **kw: torch.tensor(z_n).to(x.dtype)
# forward() normalizes mel before dispatching to _forward_no_prompt
# (flow_model.py:274); normalize here to call the no-prompt path directly
feat_norm = (feat - (-6.0)) / 2.0
res_flow_t = flow_t._forward_no_prompt(
    torch.tensor(token), torch.tensor(token_len),
    torch.tensor(feat_norm), torch.tensor(feat_len),
    torch.tensor(spk192), torch.device("cpu"), torch.float32)
torch.rand, torch.randn_like = _orig
loss_t = res_flow_t["loss"]
loss_t.backward()
grads_t = {n: p.grad.detach().numpy()
           for n, p in flow_t.named_parameters()
           if "lora_" in n and p.grad is not None}

# jax side: same batch through the flow no-prompt training path
from cosy_tpu.models.flow import flow_forward_train  # noqa: E402

flow_batch = {
    "speech_token": jnp.asarray(token, jnp.int32),
    "speech_token_len": jnp.asarray(token_len, jnp.int32),
    "speech_feat": jnp.asarray(feat),
    "speech_feat_len": jnp.asarray(feat_len, jnp.int32),
    "embedding": jnp.asarray(spk192),
}


def jax_flow_loss(lora):
    ctx = Ctx(rng=jax.random.PRNGKey(0), train=False, lora=lora,
              lora_scale=tcfg.flow_lora.scaling, lora_dropout=0.0)
    return flow_forward_train(
        P(flow_p), flow_cfg, jax.random.PRNGKey(0), flow_batch, ctx,
        no_prompt=True, noise=(t_u, z_n, cfg_u))


loss_j, grads_j = jax.value_and_grad(jax_flow_loss)(flow_lora)
check("flow.lora_loss", float(loss_j), float(loss_t.detach()), 5e-4)
gnum = sum(float(np.vdot(grads_j[k], grads_j[k])) for k in grads_j)
dots, tnorm = 0.0, 0.0
for k, gj in grads_j.items():
    tk = k.replace(".lora_A.weight", ".lora_A").replace(".lora_B.weight", ".lora_B")
    gt = grads_t.get(tk, grads_t.get(k))
    assert gt is not None, k
    gt = gt.reshape(np.asarray(gj).shape)
    dots += float(np.vdot(np.asarray(gj, np.float64), gt))
    tnorm += float(np.vdot(gt, gt))
cossim = dots / max(1e-12, np.sqrt(gnum) * np.sqrt(tnorm))
REPORT["flow.lora_grad_cosine"] = {"rel_err": float(1 - cossim), "tol": 1e-4,
                                   "ok": bool(cossim > 0.9999),
                                   "ref_scale": float(np.sqrt(tnorm))}
print(f"[{'OK ' if cossim > 0.9999 else 'FAIL'}] flow.lora_grad_cosine: "
      f"{cossim:.6f} over {n_lora} adapters", flush=True)

del flow_t, flow_p, est_t, est_j, sol_t, sol_j

# ---------------------------------------------------------------------------
# TransformerLM at full topology
# ---------------------------------------------------------------------------
t0 = time.time()
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
n_llm = sum(p.numel() for p in llm_t.parameters())
print(f"reference llm built: {n_llm/1e6:.1f}M params ({time.time()-t0:.0f}s)")

torch.save(llm_t.state_dict(), os.path.join(tmp, "llm.pt"))
llm_p = load_torch_checkpoint(os.path.join(tmp, "llm.pt"))
missing = [k for k in llm_t.state_dict() if k not in llm_p]
assert not missing, missing[:5]
print(f"llm checkpoint loaded through compat: {len(llm_p)} tensors")

batch_np = {
    "text_token": rng.integers(0, 60515, (B, 24)).astype(np.int64),
    "text_token_len": np.asarray([24, 17], np.int64),
    "speech_token": rng.integers(0, 4096, (B, 96)).astype(np.int64),
    "speech_token_len": np.asarray([96, 70], np.int64),
    "embedding": rng.standard_normal((B, 192)).astype(np.float32),
}
with torch.no_grad():
    res_t = llm_t({k: torch.tensor(v) for k, v in batch_np.items()},
                  torch.device("cpu"))
batch_j = {k: jnp.asarray(v, jnp.int32 if v.dtype == np.int64 else jnp.float32)
           for k, v in batch_np.items()}
res_j = L.llm_forward_train(P(llm_p), cfg.llm, batch_j, EVAL)
check("llm.loss", float(res_j["loss"]), float(res_t["loss"]), 2e-4)
check("llm.acc", float(res_j["acc"]), float(res_t["acc"]), 1e-6)

out_path = os.path.join(os.path.dirname(__file__), "parity_300m_result.json")
ok = all(v["ok"] for v in REPORT.values())
json.dump({"ok": ok, "flow_params_m": round(n_flow / 1e6, 1),
           "llm_params_m": round(n_llm / 1e6, 1), "checks": REPORT},
          open(out_path, "w"), indent=1)
print(("PARITY 300M OK" if ok else "PARITY 300M FAILED") + f" -> {out_path}")
sys.exit(0 if ok else 1)
