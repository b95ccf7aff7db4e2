"""Pretrained CosyVoice-300M checkpoint loading.

The reference loads llm.pt / flow.pt / hift.pt from the model dir
(cosyvoice/cli/cosyvoice.py:51-54, cli/model.py:74-116).  Because cosy_tpu
param dicts use the torch names verbatim, loading is an identity transform
plus HiFT weight-norm folding.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax

from ..config import ModelConfig
from ..params import Params, load_torch_checkpoint
from . import fold_weight_norm


def load_pretrained(
    model_dir: str,
    dtype=None,
) -> Dict[str, Params]:
    """Load {'llm', 'flow', 'hift'} param dicts from a CosyVoice model dir.

    Missing files raise — matching the reference's strict load
    (inference_joint.py:113-127).
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    out: Dict[str, Params] = {}
    for name in ("llm", "flow", "hift"):
        path = os.path.join(model_dir, f"{name}.pt")
        if not os.path.exists(path):
            raise FileNotFoundError(f"missing {path}")
        params = load_torch_checkpoint(path, dtype=dtype)
        if name == "hift":
            params = fold_weight_norm(params)
        out[name] = params
    return out


def load_or_init(
    model_dir: Optional[str],
    cfg: ModelConfig,
    rng: jax.Array,
) -> Dict[str, Params]:
    """Load pretrained weights when available, else random-init (with a loud
    warning — LoRA fine-tuning from random weights is only useful for smoke
    tests)."""
    if model_dir and os.path.exists(os.path.join(model_dir, "flow.pt")):
        return load_pretrained(model_dir)
    print("WARNING: pretrained model dir not found — random initialization "
          "(smoke-test mode; real fine-tuning needs CosyVoice-300M weights)")
    from ..models import flow as F, llm as L

    return {
        "llm": jax.jit(lambda k: L.init_llm_params(k, cfg.llm))(jax.random.fold_in(rng, 1)),
        "flow": jax.jit(lambda k: F.init_flow_params(k, cfg.flow))(jax.random.fold_in(rng, 2)),
        "hift": {},
    }
