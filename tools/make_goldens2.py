"""Golden fixtures, part 2: CosyVoice2 components.

- tiny HF Qwen2 forward (transformers is the ground truth the reference wraps)
- UpsampleConformerEncoder (streaming + non-streaming)
- CausalConditionalDecoder (streaming + non-streaming)
- Qwen2LM unistream training loss (bistream is stochastic; covered separately)

Usage: python tools/make_goldens2.py
"""

import importlib.machinery
import os

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")  # stale cross-host AOT cache is a SIGILL risk
import sys
import types

import numpy as np
import torch


def _stub(name, **attrs):
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
_stub("librosa.filters", mel=lambda **kw: np.zeros((80, 513)))
_stub("whisper")
_stub("whisper.tokenizer", Tokenizer=object)
_stub("inflect")
_stub("omegaconf", DictConfig=dict)
_stub("conformer", ConformerBlock=object)
_stub("gdown")
_stub("wget")
_stub("diffusers")
_stub("diffusers.models")
sys.path.insert(0, "/root/reference/cosyvoice_flow_finetune")

# the vendored matcha transformer/decoder import diffusers building blocks;
# the reference's own self-contained modules.py re-implements them with
# identical semantics and weight naming — reuse those as the stub bodies.
import torch.nn as _nn  # noqa: E402
import modules as _l4  # noqa: E402


class _ApproximateGELU(_nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = _nn.Linear(dim_in, dim_out)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


_stub("diffusers.models.activations",
      get_activation=lambda name: {"silu": _nn.SiLU(), "mish": _nn.Mish(),
                                   "gelu": _nn.GELU(), "relu": _nn.ReLU()}[name])
class _AdaLayerNorm(_nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError("AdaLayerNorm not used by CosyVoice decoders")


_stub("diffusers.models.attention", GELU=_l4.GELU, GEGLU=_l4.GEGLU,
      ApproximateGELU=_ApproximateGELU, AdaLayerNorm=_AdaLayerNorm,
      AdaLayerNormZero=_AdaLayerNorm)
_stub("diffusers.models.attention_processor", Attention=_l4.Attention)
_stub("diffusers.models.lora", LoRACompatibleLinear=_nn.Linear)
_stub("diffusers.utils")
_stub("diffusers.utils.torch_utils", maybe_allow_in_graph=lambda f: f)

torch.manual_seed(0)
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
os.makedirs(OUT, exist_ok=True)


def quantize_f16(module):
    """Round params to f16-representable values in place, so the golden can
    store them losslessly as float16 (the recorded outputs are produced from
    the quantized params, keeping parity tolerances tight)."""
    with torch.no_grad():
        for p in module.parameters():
            p.data = p.data.half().float()
        for b in module.buffers():
            if b.is_floating_point():
                b.data = b.data.half().float()
    return module


def seed_module(module):
    """Fill every param/buffer from tests/golden_seed.seeded_param so the
    golden only needs shapes (big hard-coded-512-channel topologies would
    otherwise make ~20 MB goldens)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from golden_seed import seeded_param
    sd = module.state_dict()
    for k, v in sd.items():
        if v.is_floating_point():
            sd[k] = torch.from_numpy(seeded_param(k, tuple(v.shape)))
    module.load_state_dict(sd)
    return module


def save(name, module, inputs, outputs, seeded=False):
    blob = {}
    if module is not None and seeded:
        for k, v in module.state_dict().items():
            if not v.is_floating_point():
                blob["param:" + k] = v.detach().numpy()
            else:
                blob["pshape:" + k] = np.asarray(v.shape, np.int32)
    elif module is not None:
        for k, v in module.state_dict().items():
            a = v.detach().numpy()
            if a.dtype == np.float32 and np.allclose(
                    a, a.astype(np.float16).astype(np.float32), rtol=0, atol=0):
                a = a.astype(np.float16)
            blob["param:" + k] = a
    for k, v in inputs.items():
        blob["in:" + k] = v.detach().numpy() if torch.is_tensor(v) else np.asarray(v)
    for k, v in outputs.items():
        blob["out:" + k] = v.detach().numpy() if torch.is_tensor(v) else np.asarray(v)
    np.savez_compressed(os.path.join(OUT, name + ".npz"), **blob)
    print(f"wrote {name}: {len(blob)} arrays")


# ---------------------------------------------------------------------------
# 1. tiny HF Qwen2 forward (hidden states + one cached step)
# ---------------------------------------------------------------------------
from transformers import Qwen2Config as HFQwen2Config  # noqa: E402
from transformers import Qwen2ForCausalLM  # noqa: E402

hf_cfg = HFQwen2Config(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=8,
    vocab_size=50, max_position_embeddings=128, rope_theta=1_000_000.0,
    rms_norm_eps=1e-6, tie_word_embeddings=False,
)
qwen = Qwen2ForCausalLM(hf_cfg).eval()
xs = torch.randn(2, 7, 32)
lens = torch.tensor([7, 5])
mask = torch.arange(7)[None, :] < lens[:, None]
with torch.no_grad():
    out = qwen.model(inputs_embeds=xs, attention_mask=mask, return_dict=True)
    hidden = out.last_hidden_state
    # incremental: prefix 4 then 1 step
    o1 = qwen.model(inputs_embeds=xs[:1, :4], use_cache=True, return_dict=True)
    o2 = qwen.model(inputs_embeds=xs[:1, 4:5], past_key_values=o1.past_key_values,
                    use_cache=True, return_dict=True)
save("qwen2", qwen.model, {"xs": xs, "lens": lens},
     {"hidden": hidden, "step_prefix": o1.last_hidden_state, "step_next": o2.last_hidden_state})

# ---------------------------------------------------------------------------
# 2. UpsampleConformerEncoder
# ---------------------------------------------------------------------------
from cosyvoice.transformer.upsample_encoder import UpsampleConformerEncoder  # noqa: E402

# tiny: the module hard-codes 512 channels in pre_lookahead/up_layer, so
# patch dims via monkey-level construction with output_size=512? Too big for a
# golden.  Instead keep output_size=512 but 1 block and small ffn.
up = UpsampleConformerEncoder(
    input_size=512, output_size=512, attention_heads=8, linear_units=64,
    num_blocks=1, dropout_rate=0.0, positional_dropout_rate=0.0,
    attention_dropout_rate=0.0, input_layer="linear",
    pos_enc_layer_type="rel_pos_espnet", macaron_style=False,
    use_cnn_module=False, static_chunk_size=25,
).eval()
seed_module(up)
xu = torch.randn(1, 9, 512)
lu = torch.tensor([9])
with torch.no_grad():
    yu, mu_ = up(xu, lu, streaming=False)
    yu_s, _ = up(xu, lu, streaming=True)
    ctxt = torch.randn(1, 3, 512)
    yu_c, _ = up(xu, lu, context=ctxt, streaming=False)
save("upsample_encoder", up, {"x": xu, "lens": lu, "context": ctxt},
     {"y": yu, "y_stream": yu_s, "y_ctx": yu_c}, seeded=True)

# ---------------------------------------------------------------------------
# 3. CausalConditionalDecoder
# ---------------------------------------------------------------------------
from cosyvoice.flow.decoder import CausalConditionalDecoder  # noqa: E402

cdec = CausalConditionalDecoder(
    in_channels=24, out_channels=6, channels=(16, 16), dropout=0.0,
    attention_head_dim=4, n_blocks=1, num_mid_blocks=1, num_heads=2,
    act_fn="gelu", static_chunk_size=4, num_decoding_left_chunks=2,
).eval()
B, C, T = 2, 6, 12
xc = torch.randn(B, C, T)
maskc = torch.ones(B, 1, T)
maskc[1, :, 9:] = 0
muc = torch.randn(B, C, T)
tc = torch.tensor([0.3, 0.6])
spkc = torch.randn(B, C)
condc = torch.randn(B, C, T)
with torch.no_grad():
    yc = cdec(xc, maskc, muc, tc, spkc, condc, streaming=False)
    yc_s = cdec(xc, maskc, muc, tc, spkc, condc, streaming=True)
save("causal_decoder", cdec,
     {"x": xc, "mask": maskc, "mu": muc, "t": tc, "spks": spkc, "cond": condc},
     {"y": yc, "y_stream": yc_s})

# ---------------------------------------------------------------------------
# 4. Qwen2LM unistream training loss
# ---------------------------------------------------------------------------
import random  # noqa: E402

from cosyvoice.llm.llm import Qwen2LM, Qwen2Encoder  # noqa: E402


class TinyQwen2Encoder(Qwen2Encoder):
    def __init__(self, model):
        torch.nn.Module.__init__(self)
        self.model = model


enc = TinyQwen2Encoder(qwen)
lm = Qwen2LM(
    llm_input_size=32, llm_output_size=32, speech_token_size=30,
    llm=enc, sampling=None, length_normalized_loss=True, lsm_weight=0.0,
    mix_ratio=[5, 15],
).eval()
batch = {
    "text_token": torch.randint(0, 50, (2, 6)),
    "text_token_len": torch.tensor([6, 4]),
    "speech_token": torch.randint(0, 30, (2, 9)),
    "speech_token_len": torch.tensor([9, 7]),
}
random.seed(123)  # sl/tl < 3 -> always unistream regardless of coin flips
with torch.no_grad():
    res = lm(batch, torch.device("cpu"))
save("qwen2lm_unistream", lm, dict(batch), {"loss": res["loss"], "acc": res["acc"]})

# ---------------------------------------------------------------------------
# 5. Off-path registry variants: PE family + conv subsampling
# ---------------------------------------------------------------------------
from cosyvoice.transformer.embedding import (  # noqa: E402
    PositionalEncoding, WhisperPositionalEncoding, LearnablePositionalEncoding,
    NoPositionalEncoding,
)
from cosyvoice.transformer.subsampling import (  # noqa: E402
    Conv1dSubsampling2, Conv2dSubsampling4, Conv2dSubsampling6, Conv2dSubsampling8,
)

torch.manual_seed(7)
D = 16
xp = torch.randn(2, 11, D)
pes = {
    "abs": PositionalEncoding(D, 0.0, max_len=64),
    "whisper": WhisperPositionalEncoding(D, 0.0, max_len=64),
    "learnable": LearnablePositionalEncoding(D, 0.0, max_len=64),
    "nope": NoPositionalEncoding(D, 0.0),
}
with torch.no_grad():
    pes["learnable"].pe.normal_()  # reference leaves it torch.empty
    blob_out, blob_param = {}, {}
    for name, mod in pes.items():
        mod.eval()
        y, pos = mod(xp, offset=0)
        y3, pos3 = mod(xp[:, :5], offset=3)
        blob_out[f"{name}_y"] = y
        blob_out[f"{name}_pos"] = pos
        blob_out[f"{name}_y_off3"] = y3
    lp = pes["learnable"].pe.detach()
save("pos_encodings", None, {"x": xp, "learnable_pe": lp}, blob_out)

subs = {
    "conv1d2": Conv1dSubsampling2(D, 12, 0.0, NoPositionalEncoding(12, 0.0)),
    "conv2d": Conv2dSubsampling4(D, 12, 0.0, NoPositionalEncoding(12, 0.0)),
    "conv2d6": Conv2dSubsampling6(D, 12, 0.0, NoPositionalEncoding(12, 0.0)),
    "conv2d8": Conv2dSubsampling8(D, 12, 0.0, NoPositionalEncoding(12, 0.0)),
}
xs = torch.randn(2, 19, D)
ms = torch.ones(2, 1, 19, dtype=torch.bool)
ms[1, :, 15:] = False
blob_p, blob_o = {}, {}
with torch.no_grad():
    for name, mod in subs.items():
        mod.eval()
        y, _, m2 = mod(xs, ms)
        for k, v in mod.state_dict().items():
            blob_p[f"{name}.{k}"] = v
        blob_o[f"{name}_y"] = y
        blob_o[f"{name}_mask"] = m2
fake = torch.nn.Module()
fake.state_dict = lambda: blob_p
save("subsampling", fake, {"x": xs, "mask": ms}, blob_o)

# ---------------------------------------------------------------------------
# 6. ASR TransformerDecoder / BiTransformerDecoder
# ---------------------------------------------------------------------------
from cosyvoice.transformer.decoder import (  # noqa: E402
    TransformerDecoder, BiTransformerDecoder,
)

torch.manual_seed(11)
dec = TransformerDecoder(
    vocab_size=30, encoder_output_size=16, attention_heads=2, linear_units=24,
    num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0,
    input_layer="embed").eval()
mem = torch.randn(2, 7, 16)
mem_len = torch.tensor([7, 5])
mem_mask = (torch.arange(7)[None, :] < mem_len[:, None]).unsqueeze(1)
ys = torch.randint(0, 30, (2, 6))
ys_len = torch.tensor([6, 4])
with torch.no_grad():
    logits, _, olens = dec(mem, mem_mask, ys, ys_len)
save("asr_decoder", dec, {"memory": mem, "memory_len": mem_len,
                          "ys_in": ys, "ys_len": ys_len},
     {"logits": logits, "olens": olens})

bidec = BiTransformerDecoder(
    vocab_size=30, encoder_output_size=16, attention_heads=2, linear_units=24,
    num_blocks=2, r_num_blocks=1, dropout_rate=0.0, positional_dropout_rate=0.0,
    self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0,
    input_layer="embed").eval()
r_ys = torch.randint(0, 30, (2, 6))
with torch.no_grad():
    l_x, r_x, olens2 = bidec(mem, mem_mask, ys, ys_len, r_ys, reverse_weight=0.3)
save("asr_bidecoder", bidec, {"memory": mem, "memory_len": mem_len,
                              "ys_in": ys, "ys_len": ys_len, "r_ys_in": r_ys},
     {"l_x": l_x, "r_x": r_x})

print("goldens part 2 written")
