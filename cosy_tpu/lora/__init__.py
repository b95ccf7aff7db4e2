"""Functional LoRA: adapter dicts over flat base params.

Reference behavior: lora.py.  Instead of wrapping nn.Modules, adapters live in
a separate flat dict keyed ``<module path>.lora_A`` / ``.lora_B`` (Linear) or
``<module path>.lora_A.weight`` / ``.lora_B.weight`` (1x1 Conv1d), consumed
transparently by ``layers.basic.dense`` / ``conv1d`` via the Ctx.  Training
differentiates only this dict — the base params are a frozen pytree argument,
which is the TPU-native expression of requires_grad=False.

Notable reference quirks preserved:
- targeting is a *substring* match on the last module-name component
  (lora.py:182: ``any(target in name ...)``);
- lora_B is initialized N(0, 0.01), not zero (lora.py:60-62) — adapters
  perturb the model from step 0 by design.
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import LoRAConfig
from ..params import Params, KeyGen


def find_lora_targets(params: Params, target_modules: Sequence[str]) -> List[str]:
    """Module paths (without ``.weight``) eligible for LoRA.

    Eligible: torch Linear (2D weight) or 1x1 Conv1d (3D weight, k==1) whose
    last name component contains any target substring (lora.py:175-209).
    """
    out = []
    for k, v in params.items():
        if not k.endswith(".weight"):
            continue
        path = k[: -len(".weight")]
        name = path.rsplit(".", 1)[-1]
        if not any(t in name for t in target_modules):
            continue
        if v.ndim == 2 or (v.ndim == 3 and v.shape[-1] == 1):
            out.append(path)
    return sorted(out)


def init_lora(key: jax.Array, params: Params, cfg: LoRAConfig,
              targets: Optional[List[str]] = None) -> Params:
    """Create adapter params for every target module (lora.py:51-62, 107-119)."""
    targets = targets if targets is not None else find_lora_targets(params, cfg.target_modules)
    kg = KeyGen(key)
    lora: Params = {}
    for path in targets:
        w = params[path + ".weight"]
        if w.ndim == 2:
            out_f, in_f = w.shape
            gain = math.sqrt(2.0 / (1 + 5.0))  # kaiming_uniform a=sqrt(5)
            bound = gain * math.sqrt(3.0 / in_f)
            lora[path + ".lora_A"] = jax.random.uniform(
                kg(), (cfg.r, in_f), jnp.float32, -bound, bound)
            lora[path + ".lora_B"] = 0.01 * jax.random.normal(kg(), (out_f, cfg.r), jnp.float32)
        else:  # 1x1 conv
            out_c, in_c, _ = w.shape
            gain = math.sqrt(2.0 / (1 + 5.0))
            bound = gain * math.sqrt(3.0 / in_c)
            lora[path + ".lora_A.weight"] = jax.random.uniform(
                kg(), (cfg.r, in_c, 1), jnp.float32, -bound, bound)
            lora[path + ".lora_B.weight"] = 0.01 * jax.random.normal(
                kg(), (out_c, cfg.r, 1), jnp.float32)
    return lora


def merge_lora(params: Params, lora: Params, scaling: float) -> Params:
    """W' = W + B @ A * scaling, returning a new original-format param dict
    (lora.py:259-323 merge + get_merged_state_dict)."""
    out = dict(params)
    for k in lora:
        if k.endswith(".lora_A"):
            path = k[: -len(".lora_A")]
            a = lora[k]
            b = lora[path + ".lora_B"]
            out[path + ".weight"] = params[path + ".weight"] + (b @ a) * scaling
        elif k.endswith(".lora_A.weight"):
            path = k[: -len(".lora_A.weight")]
            a = lora[k]  # (r, in, 1)
            b = lora[path + ".lora_B.weight"]  # (out, r, 1)
            delta = jnp.einsum("ori,ric->oic", b, a) * scaling
            out[path + ".weight"] = params[path + ".weight"] + delta
    return out


def stack_voice_loras(loras: Sequence[Params]) -> Params:
    """Stack per-voice adapter dicts along a new leading VOICE axis.

    Multi-voice serving (vLLM SupportsLoRA equivalent): every voice must
    cover the same adapter keys with the same shapes (same base model, same
    LoRAConfig targets/rank).  The result feeds ``Ctx(lora=..., lora_vids=
    per_row_voice_ids)`` — ``layers.basic`` routes each batch row through
    its own voice's delta — and ``models.llm.llm_decode*(lora=..., vids=...)``
    for the per-token decode loop."""
    if not loras:
        raise ValueError("no adapter dicts to stack")
    keys = set(loras[0])
    for i, l in enumerate(loras[1:], 1):
        if set(l) != keys:
            missing = keys.symmetric_difference(l)
            raise ValueError(f"voice {i} adapter keys differ: {sorted(missing)[:4]}")
    return {k: jnp.stack([jnp.asarray(l[k]) for l in loras]) for k in sorted(keys)}


def ensure_voice_stacked(lora: Params) -> Params:
    """Normalize an adapter dict to carry a leading voice axis (V=1 wraps).

    Dense adapter keys end ``.lora_A``/``.lora_B`` (2-D per voice); 1x1-conv
    adapter keys end ``.lora_A.weight``/``.lora_B.weight`` (3-D per voice)."""
    out: Params = {}
    for k, v in lora.items():
        v = jnp.asarray(v)
        want = 4 if k.endswith(".weight") else 3
        out[k] = v if v.ndim == want else v[None]
    return out


def lora_num_params(lora: Params) -> int:
    return int(sum(v.size for v in lora.values()))


def export_torch_lora_state(lora: Params) -> Params:
    """Adapter dict in the reference's on-disk naming (lora.py:230-236):
    torch names each wrapped layer ``<path>.lora_A`` already, so this is the
    identity — provided for symmetry/documentation."""
    return dict(lora)
