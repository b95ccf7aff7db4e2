"""Checkpoint compatibility transforms.

The param-dict naming scheme makes torch checkpoint IO an identity map
(params.load_torch_checkpoint); this module holds the few real transforms:

- weight-norm folding (HiFT checkpoints store g/v factorizations),
- Lightning / joint-checkpoint prefix handling.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..params import Params


def fold_weight_norm(params: Params) -> Params:
    """Fold torch weight_norm factorizations into plain ``.weight`` keys.

    Handles both key styles:
    - new parametrize API: ``X.parametrizations.weight.original0`` (g) /
      ``original1`` (v)
    - legacy: ``X.weight_g`` / ``X.weight_v``

    w = g * v / ||v|| with the norm over all dims except dim 0 (torch default).
    Reference models wrap HiFT convs in weight_norm (generator.py:439-487);
    the stock runtime calls remove_weight_norm at load for inference — this is
    the functional equivalent.
    """
    out: Params = {}
    handled = set()
    for k in params:
        if k.endswith(".parametrizations.weight.original0"):
            base = k[: -len(".parametrizations.weight.original0")]
            g = params[k]
            v = params[base + ".parametrizations.weight.original1"]
            axes = tuple(range(1, v.ndim))
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
            out[base + ".weight"] = g * v / jnp.maximum(norm, 1e-12)
            handled.add(k)
            handled.add(base + ".parametrizations.weight.original1")
        elif k.endswith(".weight_g"):
            base = k[: -len(".weight_g")]
            g = params[k]
            v = params[base + ".weight_v"]
            axes = tuple(range(1, v.ndim))
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
            out[base + ".weight"] = g * v / jnp.maximum(norm, 1e-12)
            handled.add(k)
            handled.add(base + ".weight_v")
    for k, v in params.items():
        if k not in handled and k not in out:
            out[k] = v
    return out


def strip_lightning_prefixes(params: Params, submodule: str) -> Params:
    """Extract ``submodule`` weights from a Lightning joint checkpoint,
    accepting ``model.<sub>.`` or ``<sub>.`` prefixes and unwrapping LoRA
    ``original_layer`` indirection (reference: merge_joint_weights.py:117-178).
    """
    out: Params = {}
    for k, v in params.items():
        for pre in (f"model.{submodule}.", f"{submodule}."):
            if k.startswith(pre):
                key = k[len(pre):]
                key = key.replace(".original_layer.", ".")
                out[key] = v
                break
    return out
