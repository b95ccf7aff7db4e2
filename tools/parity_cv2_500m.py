"""CosyVoice2 family parity at production scale (Qwen2-0.5B stack).

Extends tools/parity_300m.py to the second model family: the HF Qwen2-0.5B
backbone, the Qwen2LM unistream training loss, the UpsampleConformerEncoder,
and the causal streaming estimator — all at the real CosyVoice2 topology
with seeded random weights, loaded through the production ``.pt`` path.

Writes tools/parity_cv2_500m_result.json.  Run:
    python tools/parity_cv2_500m.py   (~6 min CPU)
"""

import importlib.machinery
import json
import os

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")  # stale cross-host AOT cache is a SIGILL risk
import random
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
            "onnxruntime", "whisper", "inflect", "lightning",
            "pytorch_lightning", "gdown", "wget", "vllm"):
    _stub(mod)
_stub("conformer", ConformerBlock=object)
_stub("librosa")
_stub("librosa.filters", mel=lambda **kw: np.zeros((80, 513)))
_stub("omegaconf", DictConfig=dict)

# the vendored matcha blocks import diffusers; reuse the reference's own
# self-contained equivalents as stub bodies (same trick as make_goldens2.py)
sys.path.insert(0, "/root/reference/cosyvoice_flow_finetune")
import torch.nn as _nn  # noqa: E402
import modules as _l4  # noqa: E402


class _ApproximateGELU(_nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = _nn.Linear(dim_in, dim_out)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


class _AdaLayerNorm(_nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError("AdaLayerNorm not used by CosyVoice decoders")


_stub("diffusers")
_stub("diffusers.models")
_stub("diffusers.models.activations",
      get_activation=lambda name: {"silu": _nn.SiLU(), "mish": _nn.Mish(),
                                   "gelu": _nn.GELU(), "relu": _nn.ReLU()}[name])
_stub("diffusers.models.attention", GELU=_l4.GELU, GEGLU=_l4.GEGLU,
      ApproximateGELU=_ApproximateGELU, AdaLayerNorm=_AdaLayerNorm,
      AdaLayerNormZero=_AdaLayerNorm)
_stub("diffusers.models.attention_processor", Attention=_l4.Attention)
_stub("diffusers.models.lora", LoRACompatibleLinear=_nn.Linear)
_stub("diffusers.utils")
_stub("diffusers.utils.torch_utils", maybe_allow_in_graph=lambda f: f)

torch.manual_seed(20260816)
REPORT = {}


def check(name, got, want, tol):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    denom = max(1e-9, float(np.max(np.abs(want))))
    err = float(np.max(np.abs(got - want))) / denom
    REPORT[name] = {"rel_err": err, "tol": tol, "ok": bool(err < tol)}
    print(f"[{'OK ' if err < tol else 'FAIL'}] {name}: rel_err={err:.3e} "
          f"(tol {tol})", flush=True)


import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from cosy_tpu.ctx import EVAL  # noqa: E402
from cosy_tpu.params import P, load_torch_checkpoint  # noqa: E402

tmp = tempfile.mkdtemp()
rng = np.random.default_rng(7)

# ---------------------------------------------------------------------------
# 1. HF Qwen2-0.5B backbone forward + one cached decode step
# ---------------------------------------------------------------------------
from transformers import Qwen2Config as HFQwen2Config  # noqa: E402
from transformers import Qwen2ForCausalLM  # noqa: E402

from cosy_tpu.layers.qwen2 import Qwen2Config, qwen2_forward  # noqa: E402

QCFG = Qwen2Config()  # 0.5B defaults
t0 = time.time()
hf_cfg = HFQwen2Config(
    hidden_size=QCFG.hidden_size, intermediate_size=QCFG.intermediate_size,
    num_hidden_layers=QCFG.num_hidden_layers,
    num_attention_heads=QCFG.num_attention_heads,
    num_key_value_heads=QCFG.num_key_value_heads,
    vocab_size=QCFG.vocab_size, max_position_embeddings=QCFG.max_position_embeddings,
    rope_theta=QCFG.rope_theta, rms_norm_eps=QCFG.rms_norm_eps, tie_word_embeddings=True)
qwen_t = Qwen2ForCausalLM(hf_cfg).eval().float()
n_q = sum(p.numel() for p in qwen_t.parameters())
print(f"HF Qwen2 built: {n_q/1e6:.1f}M params ({time.time()-t0:.0f}s)", flush=True)

torch.save({"llm.model." + k: v for k, v in qwen_t.state_dict().items()},
           os.path.join(tmp, "llm.pt"))
lm_p = load_torch_checkpoint(os.path.join(tmp, "llm.pt"))

B, T = 2, 48
emb = rng.standard_normal((B, T, QCFG.hidden_size)).astype(np.float32) * 0.02
lens = np.asarray([T, T - 9], np.int64)
with torch.no_grad():
    am = (torch.arange(T)[None, :] < torch.tensor(lens)[:, None]).long()
    out_t = qwen_t.model(inputs_embeds=torch.tensor(emb), attention_mask=am,
                         output_hidden_states=True).last_hidden_state
h_j = qwen2_forward(P(lm_p).sub("llm.model.model"), QCFG, jnp.asarray(emb),
                    jnp.asarray(lens, jnp.int32), EVAL)
# compare valid rows only
for b, n in enumerate(lens):
    check(f"qwen2.hidden[{b}]", h_j[b, :n], out_t[b, :n].numpy(), 5e-4)

# ---------------------------------------------------------------------------
# 2. Qwen2LM unistream training loss at scale
# ---------------------------------------------------------------------------
from cosyvoice.llm.llm import Qwen2LM, Qwen2Encoder  # noqa: E402

from cosy_tpu.models.qwen2lm import (Qwen2LMConfig, qwen2lm_forward_train,  # noqa: E402
                                     init_qwen2lm_params)


class FullQwen2Encoder(Qwen2Encoder):
    def __init__(self, model):
        torch.nn.Module.__init__(self)
        self.model = model


lm_t = Qwen2LM(
    llm_input_size=QCFG.hidden_size, llm_output_size=QCFG.hidden_size,
    speech_token_size=6561, llm=FullQwen2Encoder(qwen_t), sampling=None,
    length_normalized_loss=True, lsm_weight=0.0, mix_ratio=[5, 15]).eval().float()
torch.save(lm_t.state_dict(), os.path.join(tmp, "llm_full.pt"))
lmp = load_torch_checkpoint(os.path.join(tmp, "llm_full.pt"))

LCFG = Qwen2LMConfig()
batch_np = {
    "text_token": rng.integers(0, QCFG.vocab_size, (B, 3)).astype(np.int64),
    "text_token_len": np.asarray([3, 2], np.int64),
    "speech_token": rng.integers(0, 6561, (B, 8)).astype(np.int64),
    "speech_token_len": np.asarray([8, 6], np.int64),
}
random.seed(123)  # sl*5 < tl*15 impossible here? keep lens tiny -> unistream
with torch.no_grad():
    res_t = lm_t({k: torch.tensor(v) for k, v in batch_np.items()},
                 torch.device("cpu"))
batch_j = {k: jnp.asarray(v, jnp.int32) for k, v in batch_np.items()}
res_j = qwen2lm_forward_train(P(lmp), LCFG, batch_j, EVAL, rng=None)
check("qwen2lm.loss", float(res_j["loss"]), float(res_t["loss"]), 5e-4)
check("qwen2lm.acc", float(res_j["acc"]), float(res_t["acc"]), 1e-6)

del qwen_t, lm_t, lm_p, lmp

# ---------------------------------------------------------------------------
# 3. UpsampleConformerEncoder at production topology
# ---------------------------------------------------------------------------
from cosyvoice.transformer.upsample_encoder import UpsampleConformerEncoder  # noqa: E402

from cosy_tpu.config import EncoderConfig  # noqa: E402
from cosy_tpu.layers.upsample_encoder import upsample_encoder_forward  # noqa: E402

up_t = UpsampleConformerEncoder(
    input_size=512, output_size=512, attention_heads=8, linear_units=2048,
    num_blocks=6, dropout_rate=0.1, positional_dropout_rate=0.1,
    attention_dropout_rate=0.1, normalize_before=True, input_layer="linear",
    pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
    use_cnn_module=False, macaron_style=False, static_chunk_size=25).eval().float()
n_up = sum(p.numel() for p in up_t.parameters())
print(f"UpsampleConformerEncoder built: {n_up/1e6:.1f}M params", flush=True)
torch.save(up_t.state_dict(), os.path.join(tmp, "up.pt"))
up_p = load_torch_checkpoint(os.path.join(tmp, "up.pt"))

xu = rng.standard_normal((1, 40, 512)).astype(np.float32)
lu = np.asarray([40], np.int64)
with torch.no_grad():
    yu_t, _ = up_t(torch.tensor(xu), torch.tensor(lu), streaming=False)
    yu_ts, _ = up_t(torch.tensor(xu), torch.tensor(lu), streaming=True)

UP_CFG = EncoderConfig(input_size=512, output_size=512, attention_heads=8,
                       linear_units=2048, num_blocks=6, macaron_style=False,
                       use_cnn_module=False, static_chunk_size=25)
yu_j, _ = upsample_encoder_forward(P(up_p), UP_CFG, jnp.asarray(xu),
                                   jnp.asarray(lu, jnp.int32), streaming=False)
check("upsample_encoder.full", yu_j, yu_t.numpy(), 5e-4)
yu_js, _ = upsample_encoder_forward(P(up_p), UP_CFG, jnp.asarray(xu),
                                    jnp.asarray(lu, jnp.int32), streaming=True)
check("upsample_encoder.streaming", yu_js, yu_ts.numpy(), 5e-4)

del up_t, up_p

# ---------------------------------------------------------------------------
# 4. CausalConditionalDecoder (CV2 estimator) at production topology
# ---------------------------------------------------------------------------
from cosyvoice.flow.decoder import CausalConditionalDecoder  # noqa: E402

from cosy_tpu.config import EstimatorConfig  # noqa: E402
from cosy_tpu.layers.unet import conditional_decoder  # noqa: E402

cd_t = CausalConditionalDecoder(
    in_channels=320, out_channels=80, channels=(256, 256), dropout=0.0,
    attention_head_dim=64, n_blocks=4, num_mid_blocks=12, num_heads=8,
    act_fn="gelu", static_chunk_size=50, num_decoding_left_chunks=2).eval().float()
n_cd = sum(p.numel() for p in cd_t.parameters())
print(f"CausalConditionalDecoder built: {n_cd/1e6:.1f}M params", flush=True)
torch.save(cd_t.state_dict(), os.path.join(tmp, "cd.pt"))
cd_p = load_torch_checkpoint(os.path.join(tmp, "cd.pt"))

Bc, Tc = 2, 100
xc = rng.standard_normal((Bc, 80, Tc)).astype(np.float32)
maskc = np.ones((Bc, 1, Tc), np.float32)
muc = rng.standard_normal((Bc, 80, Tc)).astype(np.float32)
tc = np.asarray([0.25, 0.75], np.float32)
spkc = rng.standard_normal((Bc, 80)).astype(np.float32)
condc = rng.standard_normal((Bc, 80, Tc)).astype(np.float32) * 0.1
with torch.no_grad():
    yc_t = cd_t(torch.tensor(xc), torch.tensor(maskc), torch.tensor(muc),
                torch.tensor(tc), torch.tensor(spkc), torch.tensor(condc),
                streaming=False)
    yc_ts = cd_t(torch.tensor(xc), torch.tensor(maskc), torch.tensor(muc),
                 torch.tensor(tc), torch.tensor(spkc), torch.tensor(condc),
                 streaming=True)
ECFG = EstimatorConfig()
yc_j = conditional_decoder(P(cd_p), ECFG, jnp.asarray(xc), jnp.asarray(maskc),
                           jnp.asarray(muc), jnp.asarray(tc), jnp.asarray(spkc),
                           jnp.asarray(condc), EVAL, causal=True, streaming=False)
check("causal_decoder.full", yc_j, yc_t.numpy(), 1e-3)
yc_js = conditional_decoder(P(cd_p), ECFG, jnp.asarray(xc), jnp.asarray(maskc),
                            jnp.asarray(muc), jnp.asarray(tc), jnp.asarray(spkc),
                            jnp.asarray(condc), EVAL, causal=True, streaming=True,
                            static_chunk_size=50)
check("causal_decoder.streaming", yc_js, yc_ts.numpy(), 1e-3)

out_path = os.path.join(os.path.dirname(__file__), "parity_cv2_500m_result.json")
ok = all(v["ok"] for v in REPORT.values())
json.dump({"ok": ok, "qwen_params_m": round(n_q / 1e6, 1),
           "upsample_params_m": round(n_up / 1e6, 1),
           "causal_decoder_params_m": round(n_cd / 1e6, 1),
           "checks": REPORT}, open(out_path, "w"), indent=1)
print(("PARITY CV2 500M OK" if ok else "PARITY CV2 500M FAILED") + f" -> {out_path}")
sys.exit(0 if ok else 1)
