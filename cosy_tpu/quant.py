"""Weight-only int8 quantization for inference param dicts.

bs=1 AR decode is weight-bandwidth-bound (PERF.md roofline): every token
streams the full LLM from HBM.  Symmetric per-output-channel int8 halves
that traffic; `layers.basic.dense` dequantizes transparently when it sees an
int8 ``.weight`` with a ``.weight@scale`` sibling, so any model family's
inference path can opt in by transforming its params once at load time.

The CosyVoice-300M decode loop has its own fused stacked-int8 path
(models/llm._stack_decode_layers); this module is the generic equivalent
used by the Qwen2/CosyVoice2 family, where layers are addressed through the
flat dict.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp

# the large projection matrices of a Qwen2 block — everything else
# (embeddings, norms, head) stays in the original dtype
QWEN2_PROJ_SUFFIXES: Tuple[str, ...] = (
    "q_proj.weight", "k_proj.weight", "v_proj.weight", "o_proj.weight",
    "gate_proj.weight", "up_proj.weight", "down_proj.weight",
)


def quantize_int8(
    params: Dict[str, jax.Array],
    suffixes: Iterable[str] = QWEN2_PROJ_SUFFIXES,
    prefix: str = "",
) -> Dict[str, jax.Array]:
    """Return a copy of ``params`` with matching 2-D weights replaced by
    symmetric per-output-channel int8 plus a fp32 ``@scale`` sibling."""
    suffixes = tuple(suffixes)
    out = dict(params)
    for name, w in params.items():
        if not name.startswith(prefix) or not name.endswith(suffixes):
            continue
        if getattr(w, "ndim", 0) != 2:
            continue
        w32 = jnp.asarray(w, jnp.float32)
        sc = jnp.maximum(jnp.max(jnp.abs(w32), axis=1, keepdims=True) / 127.0,
                         1e-12)
        out[name] = jnp.clip(jnp.round(w32 / sc), -127, 127).astype(jnp.int8)
        out[name + "@scale"] = sc[:, 0]
    return out


def count_quantized(params: Dict[str, jax.Array]) -> int:
    return sum(1 for k, v in params.items()
               if getattr(v, "dtype", None) == jnp.int8)


# ---------------------------------------------------------------------------
# bf16-vs-int8 voice validation (the harness behind `--int8` being opt-in)
# ---------------------------------------------------------------------------


def validate_int8_voice(
    model_cfg,
    llm_params: Dict[str, jax.Array],
    flow_params: Dict[str, jax.Array],
    hift_params: Dict[str, jax.Array],
    infer_cfg=None,
    text_token_list=None,  # list of (1, Tt) int arrays — the prompt set
    seeds: Iterable[int] = (0, 1, 2),
    finetuned_norm: bool = True,
    max_len_cap: int = 2048,
) -> Dict:
    """Decode every prompt in bf16 AND int8 (same rng) and quantify the
    divergence quantization introduces for THIS voice.

    int8 weight-only decode is +~30% tok/s but rounds the logits, so the
    sampled token stream can diverge (PERF.md int8 section) — whether that
    divergence is audible is voice-dependent, so it must be measured per
    deployed voice, not assumed.  Per prompt x seed:

    - ``agreement``: fraction of positions where the two token streams
      match, over the longer stream (1.0 = bit-identical decode);
    - ``mcd_db``: DTW-aligned mel-cepstral distortion between the two
      synthesized waveforms (both through the SAME bf16 token2wav, so the
      audio delta is attributable to decode quantization alone).

    Returns {"prompts": [...], "agreement_min", "mcd_db_max", ...}; the CLI
    (tools/validate_quant.py) applies thresholds and exits non-zero.
    """
    import numpy as np

    from .config import InferenceConfig, replace
    from .infer.pipeline import TTSPipeline
    from .ops.audio import mel_spectrogram
    from .ops.mcd import mcd

    icfg = infer_cfg or InferenceConfig()
    pipe_bf16 = TTSPipeline(model_cfg, llm_params, flow_params, hift_params,
                            replace(icfg, int8_decode=False),
                            finetuned_norm=finetuned_norm)
    pipe_int8 = TTSPipeline(model_cfg, llm_params, flow_params, hift_params,
                            replace(icfg, int8_decode=True),
                            finetuned_norm=finetuned_norm)
    spk_dim = model_cfg.flow.spk_embed_dim
    spk = np.zeros((1, spk_dim), np.float32)

    rows = []
    for pi, text in enumerate(text_token_list):
        for seed in seeds:
            rng = jax.random.PRNGKey(seed)
            k_llm, k_wav = jax.random.split(rng)
            toks = {}
            for tag, pipe in (("bf16", pipe_bf16), ("int8", pipe_int8)):
                toks[tag] = pipe.generate_tokens(
                    k_llm, np.asarray(text), spk_embedding=spk,
                    max_len_cap=max_len_cap)[0]
            a, b = toks["bf16"], toks["int8"]
            n = max(len(a), len(b), 1)
            m = min(len(a), len(b))
            agreement = float((a[:m] == b[:m]).sum() / n)
            if agreement == 1.0:
                mcd_db = 0.0  # identical tokens -> identical audio
            else:
                mels = {}
                for tag, t in toks.items():
                    wav, _ = pipe_bf16.token2wav(k_wav, t[None], None, None,
                                                 spk, finalize=True)
                    mels[tag] = np.asarray(
                        mel_spectrogram(jnp.asarray(wav)))[0].T  # (T, 80)
                mcd_db = mcd(mels["int8"], mels["bf16"], align=True)
            rows.append({"prompt": pi, "seed": seed,
                         "tokens_bf16": int(len(a)), "tokens_int8": int(len(b)),
                         "agreement": round(agreement, 4),
                         "mcd_db": round(float(mcd_db), 4)})
    return {
        "prompts": rows,
        "agreement_min": min(r["agreement"] for r in rows),
        "agreement_mean": float(sum(r["agreement"] for r in rows) / len(rows)),
        "mcd_db_max": max(r["mcd_db"] for r in rows),
    }
