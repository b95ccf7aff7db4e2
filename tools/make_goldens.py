"""Generate golden parity fixtures from the reference implementation.

Runs the reference torch modules (mounted read-only at /root/reference) on
tiny seeded configs and records (state_dict, inputs, outputs) into
tests/goldens/*.npz.  The committed fixtures make the parity tests
self-contained — the reference tree is only needed to regenerate them.

Usage: python tools/make_goldens.py
"""

import os

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")  # stale cross-host AOT cache is a SIGILL risk
import sys

sys.path.insert(0, "/root/reference/cosyvoice_flow_finetune")

import importlib.machinery
import types

import numpy as np
import torch


def _stub(name, **attrs):
    """Register a fake module so reference imports of unavailable heavy deps
    (torchaudio, onnxruntime, ...) resolve; none of their functionality is
    exercised by the tiny golden configs."""
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m


_stub("torchaudio")
_stub("torchaudio.compliance")
_stub("torchaudio.compliance.kaldi")
_stub("onnxruntime")
_stub("librosa")
_stub("librosa.filters", mel=lambda **kw: np.zeros((kw.get("n_mels", 80), kw.get("n_fft", 1024) // 2 + 1)))
_stub("whisper")
_stub("inflect")
_stub("omegaconf", DictConfig=dict)
_stub("diffusers")
_stub("diffusers.models")
_stub("diffusers.models.attention")
_stub("diffusers.models.attention_processor")
_stub("diffusers.models.lora")
_stub("diffusers.utils")
_stub("diffusers.utils.torch_utils", maybe_allow_in_graph=lambda f: f)
_stub("conformer")
_stub("lightning")
_stub("pytorch_lightning")

torch.manual_seed(0)

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
os.makedirs(OUT, exist_ok=True)


def save(name, module, inputs, outputs):
    blob = {}
    if module is not None:
        for k, v in module.state_dict().items():
            blob["param:" + k] = v.detach().numpy()
    for k, v in inputs.items():
        blob["in:" + k] = v.detach().numpy() if torch.is_tensor(v) else np.asarray(v)
    for k, v in outputs.items():
        blob["out:" + k] = v.detach().numpy() if torch.is_tensor(v) else np.asarray(v)
    np.savez(os.path.join(OUT, name + ".npz"), **blob)
    print(f"wrote {name}: {len(blob)} arrays")


# ---------------------------------------------------------------------------
# 1. L4 ConformerEncoder (flow encoder flavor, NO xscale)
# ---------------------------------------------------------------------------
import modules as ref_modules  # noqa: E402

enc = ref_modules.ConformerEncoder(
    input_size=12, output_size=16, attention_heads=2, linear_units=24,
    num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    attention_dropout_rate=0.0, use_cnn_module=False, macaron_style=False,
).eval()
x = torch.randn(2, 7, 12)
lens = torch.tensor([7, 5])
with torch.no_grad():
    out, masks = enc(x, lens)
save("conformer_l4", enc, {"x": x, "lens": lens}, {"y": out})

# ---------------------------------------------------------------------------
# 2. L2 vendored encoders (xscale, rel_pos_espnet): conformer + transformer
# ---------------------------------------------------------------------------
from cosyvoice.transformer.encoder import ConformerEncoder as L2Conformer  # noqa: E402
from cosyvoice.transformer.encoder import TransformerEncoder as L2Transformer  # noqa: E402

enc2 = L2Conformer(
    input_size=12, output_size=16, attention_heads=2, linear_units=24,
    num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    attention_dropout_rate=0.0, input_layer="linear",
    pos_enc_layer_type="rel_pos_espnet", use_cnn_module=False,
    macaron_style=False, static_chunk_size=1,
).eval()
with torch.no_grad():
    out2, _ = enc2(x, lens, decoding_chunk_size=1, num_decoding_left_chunks=-1)
save("conformer_l2_causal", enc2, {"x": x, "lens": lens}, {"y": out2})

tr = L2Transformer(
    input_size=16, output_size=16, attention_heads=2, linear_units=24,
    num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    attention_dropout_rate=0.0, input_layer="linear_legacy",
    pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
    static_chunk_size=1,
).eval()
xt = torch.randn(2, 6, 16)
lt = torch.tensor([6, 4])
with torch.no_grad():
    out3, _ = tr(xt, lt)
save("transformer_l2_causal", tr, {"x": xt, "lens": lt}, {"y": out3})

# incremental forward_chunk parity (AR decode path)
with torch.no_grad():
    xs1 = torch.randn(1, 4, 16)
    att_cache = torch.zeros((0, 0, 0, 0))
    cnn_cache = torch.zeros((0, 0, 0, 0))
    att_mask = torch.tril(torch.ones((1, 4, 4))).to(torch.bool)
    y1, att_cache, cnn_cache = tr.forward_chunk(xs1, offset=0, required_cache_size=-1,
                                                att_cache=att_cache, cnn_cache=cnn_cache,
                                                att_mask=att_mask)
    xs2 = torch.randn(1, 1, 16)
    y2, att_cache2, _ = tr.forward_chunk(xs2, offset=4, required_cache_size=-1,
                                         att_cache=att_cache, cnn_cache=cnn_cache,
                                         att_mask=torch.ones((1, 1, 5), dtype=torch.bool))
save("transformer_l2_chunk", tr, {"xs1": xs1, "xs2": xs2}, {"y1": y1, "y2": y2})

# ---------------------------------------------------------------------------
# 3. ConditionalDecoder (U-Net estimator)
# ---------------------------------------------------------------------------
est = ref_modules.ConditionalDecoder(
    in_channels=24, out_channels=6, channels=(16, 16), dropout=0.0,
    attention_head_dim=4, n_blocks=1, num_mid_blocks=2, num_heads=2,
    act_fn="gelu",
).eval()
B, C, T = 2, 6, 12
xe = torch.randn(B, C, T)
mask = torch.ones(B, 1, T)
mask[1, :, 9:] = 0
mu = torch.randn(B, C, T)
tstep = torch.tensor([0.25, 0.7])
spks = torch.randn(B, C)
cond = torch.randn(B, C, T)
with torch.no_grad():
    est.prompt_isolation_len = 0
    y_est = est(xe, mask, mu, tstep, spks, cond)
    est.prompt_isolation_len = 4
    est.prompt_isolation_enabled = True
    y_est_iso = est(xe, mask, mu, tstep, spks, cond)
    est.prompt_isolation_len = 0
save("estimator", est,
     {"x": xe, "mask": mask, "mu": mu, "t": tstep, "spks": spks, "cond": cond,
      "prompt_len": np.asarray(4)},
     {"y": y_est, "y_iso": y_est_iso})

# ---------------------------------------------------------------------------
# 4. ConditionalCFM.solve_euler (deterministic given z)
# ---------------------------------------------------------------------------
# solve_euler hard-codes 80 mel channels (flow_model.py:100-105), so use a
# tiny 80-channel estimator here
est80 = ref_modules.ConditionalDecoder(
    in_channels=320, out_channels=80, channels=(16, 16), dropout=0.0,
    attention_head_dim=4, n_blocks=1, num_mid_blocks=1, num_heads=2,
    act_fn="gelu",
).eval()
cfm = __import__("flow_model").ConditionalCFM(
    in_channels=80, sigma_min=1e-6, t_scheduler="cosine",
    training_cfg_rate=0.2, inference_cfg_rate=0.7, estimator=est80,
)
n_timesteps = 4
t_span = torch.linspace(0, 1, n_timesteps + 1)
t_span = 1 - torch.cos(t_span * 0.5 * 3.14159265359)
z = torch.randn(1, 80, 12)
mu1 = torch.randn(1, 80, 12)
mask1 = torch.ones(1, 1, 12)
spks1 = torch.randn(1, 80)
cond1 = torch.randn(1, 80, 12)
with torch.no_grad():
    y_euler = cfm.solve_euler(z.clone(), t_span, mu1, mask1, spks1, cond1)
save("cfm_euler", est80,
     {"z": z, "mu": mu1, "mask": mask1, "spks": spks1, "cond": cond1,
      "n_timesteps": np.asarray(n_timesteps)},
     {"y": y_euler})

# ---------------------------------------------------------------------------
# 5. InterpolateRegulator
# ---------------------------------------------------------------------------
reg = ref_modules.InterpolateRegulator(channels=6, sampling_ratios=(1, 1, 1, 1), out_channels=6).eval()
xr = torch.randn(2, 9, 6)
ylens = torch.tensor([14, 10])
with torch.no_grad():
    yr, _ = reg(xr, ylens)
    # inference path: x2 longer than 40 tokens
    x2 = torch.randn(1, 50, 6)
    x1 = torch.randn(1, 7, 6)
    yr_inf, _ = reg.inference(x1, x2, 11, 69, 50)
    yr_inf_np, _ = reg.inference(x1[:, :0], x2, 0, 69, 50)
save("regulator", reg, {"x": xr, "ylens": ylens, "x1": x1, "x2": x2},
     {"y": yr, "y_inf": yr_inf, "y_inf_np": yr_inf_np})

# ---------------------------------------------------------------------------
# 6. TransformerLM training forward (loss + acc) — tiny topology
# ---------------------------------------------------------------------------
sys.path.insert(0, "/root/reference/cosyvoice_flow_finetune")
from cosyvoice.llm.llm import TransformerLM  # noqa: E402

text_enc = L2Conformer(
    input_size=12, output_size=16, attention_heads=2, linear_units=24,
    num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    attention_dropout_rate=0.0, input_layer="linear",
    pos_enc_layer_type="rel_pos_espnet", use_cnn_module=False,
    macaron_style=False, static_chunk_size=1,
)
llm_backbone = L2Transformer(
    input_size=16, output_size=16, attention_heads=2, linear_units=24,
    num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    attention_dropout_rate=0.0, input_layer="linear_legacy",
    pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
    static_chunk_size=1,
)
lm = TransformerLM(
    text_encoder_input_size=12, llm_input_size=16, llm_output_size=16,
    text_token_size=40, speech_token_size=30, text_encoder=text_enc,
    llm=llm_backbone, sampling=None, length_normalized_loss=True,
    lsm_weight=0.0, spk_embed_dim=10,
).eval()
batch = {
    "text_token": torch.randint(0, 40, (2, 5)),
    "text_token_len": torch.tensor([5, 3]),
    "speech_token": torch.randint(0, 30, (2, 8)),
    "speech_token_len": torch.tensor([8, 6]),
    "embedding": torch.randn(2, 10),
}
with torch.no_grad():
    res = lm(batch, torch.device("cpu"))
save("transformer_lm", lm,
     {k: v for k, v in batch.items()},
     {"loss": res["loss"], "acc": res["acc"]})

# ---------------------------------------------------------------------------
# 7. LoRA forward + merge algebra
# ---------------------------------------------------------------------------
import lora as ref_lora  # noqa: E402

lin_model = torch.nn.Sequential()
lin_model.add_module("linear_q", torch.nn.Linear(8, 8))
lin_model.add_module("w_1", torch.nn.Linear(8, 12))
stats = ref_lora.apply_lora_to_model(lin_model, r=2, lora_alpha=4, lora_dropout=0.0,
                                     target_modules=["linear_q", "w_1"])
lin_model.eval()
xl = torch.randn(3, 8)
with torch.no_grad():
    y_lora = lin_model.w_1(lin_model.linear_q(xl))
# snapshot base weights BEFORE merging: get_merged_state_dict mutates the
# original weights in place (the quirk merge_joint_weights.py:244-252 works around)
base_state = {k: v.clone() for k, v in lin_model.state_dict().items()}
merged = ref_lora.get_merged_state_dict(lin_model)
with torch.no_grad():
    y_merged = torch.nn.functional.linear(
        torch.nn.functional.linear(xl, merged["linear_q.weight"], merged["linear_q.bias"]),
        merged["w_1.weight"], merged["w_1.bias"])
lin_model.load_state_dict(base_state)
save("lora", lin_model, {"x": xl},
     {"y": y_lora, "y_merged": y_merged,
      **{"merged:" + k: v for k, v in merged.items()}})

# ---------------------------------------------------------------------------
# 8. HiFT generator decode (deterministic part: f0_predictor + decode w/ fixed source)
# ---------------------------------------------------------------------------
from cosyvoice.hifigan.generator import HiFTGenerator  # noqa: E402
from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor  # noqa: E402

f0p = ConvRNNF0Predictor(num_class=1, in_channels=6, cond_channels=8)
hift = HiFTGenerator(
    in_channels=6, base_channels=16, nb_harmonics=2, sampling_rate=22050,
    upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
    istft_params={"n_fft": 16, "hop_len": 4},
    resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
    source_resblock_kernel_sizes=[3, 3], source_resblock_dilation_sizes=[[1], [1]],
    f0_predictor=f0p,
).eval()
mel = torch.randn(1, 6, 10)
# fixed source signal of the right length: T * 4*4*4 samples
s = torch.randn(1, 1, 10 * 4 * 4 * 4)
with torch.no_grad():
    f0 = hift.f0_predictor(mel)
    wav = hift.decode(mel, s)
save("hift_decode", hift, {"mel": mel, "s": s}, {"f0": f0, "wav": wav})

# ---------------------------------------------------------------------------
# 9. mel_spectrogram STFT core (torch.stft parity target)
# ---------------------------------------------------------------------------
wav_in = torch.sin(torch.linspace(0, 200, 2048)).unsqueeze(0) * 0.5
n_fft, hop, win = 1024, 256, 1024
pad = int((n_fft - hop) / 2)
y = torch.nn.functional.pad(wav_in.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
spec = torch.stft(y, n_fft, hop_length=hop, win_length=win,
                  window=torch.hann_window(win), center=False,
                  pad_mode="reflect", normalized=False, onesided=True,
                  return_complex=True)
mag = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
save("stft", None, {"wav": wav_in}, {"mag": mag})

print("all goldens written")
