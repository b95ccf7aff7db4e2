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
