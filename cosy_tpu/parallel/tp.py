"""Tensor-parallel parameter sharding over the ``model`` mesh axis.

The reference has no tensor parallelism — its only scale-out is torch DDP
(SURVEY.md §2.5); the mesh reserves a ``model`` axis for exactly this.  This
module supplies Megatron-style row/column splits expressed as GSPMD
PartitionSpecs over the flat torch-named param dict: attention Q/K/V and the
first feed-forward matmul split their *output* dimension (torch weight axis
0), the attention output and second feed-forward matmul split their *input*
dimension (axis 1).  XLA's SPMD partitioner inserts the all-reduces (over ICI
on a real slice); results are bit-comparable to the replicated run because
GSPMD sharding is a layout annotation, not a numerics change.

Rules cover every transformer family in the framework:
- conformer/transformer encoders (layers/conformer.py):
  ``self_attn.linear_{q,k,v,out}``, ``feed_forward[_macaron].w_{1,2}``
- the CFM estimator's diffusers blocks (layers/unet.py):
  ``attn1.to_{q,k,v}``, ``attn1.to_out.0``, ``ff.net.0.proj``, ``ff.net.2``
- Qwen2 (layers/qwen2.py): ``{q,k,v}_proj`` / ``o_proj``,
  ``gate_proj``/``up_proj`` / ``down_proj``

A leaf only splits when the dimension divides evenly by the model-axis size
(e.g. Qwen2's 2 GQA KV heads stay replicated at tp=4); everything else
replicates, so any tp size is always valid, just less sharded.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec


# module-name suffixes whose .weight (torch (out, in)) splits the OUTPUT dim
# (axis 0); their .bias splits with them
_ROW_MODULES = (
    ".self_attn.linear_q",
    ".self_attn.linear_k",
    ".self_attn.linear_v",
    ".feed_forward.w_1",
    ".feed_forward_macaron.w_1",
    ".attn1.to_q",
    ".attn1.to_k",
    ".attn1.to_v",
    ".ff.net.0.proj",
    ".q_proj",
    ".k_proj",
    ".v_proj",
    ".gate_proj",
    ".up_proj",
)

# module-name suffixes whose .weight splits the INPUT dim (axis 1); the bias
# adds after the cross-shard reduction, so it stays replicated
_COL_MODULES = (
    ".self_attn.linear_out",
    ".feed_forward.w_2",
    ".feed_forward_macaron.w_2",
    ".attn1.to_out.0",
    ".ff.net.2",
    ".o_proj",
    ".down_proj",
)


def tp_spec(name: str, shape, tp: int) -> PSpec:
    """PartitionSpec for one flat torch-named parameter at model-axis size tp."""
    if tp <= 1 or not shape:
        return PSpec()
    # expert parallelism: stacked MoE expert weights (E, ...) shard the
    # expert axis over ``model``; each device computes its experts and the
    # routed combine's contraction over E becomes an XLA psum
    # (layers/conformer.moe_ffn stacked path)
    if ".experts_stacked." in name:
        if shape[0] % tp == 0 and shape[0] >= tp:
            return PSpec("model", *([None] * (len(shape) - 1)))
        return PSpec()
    for mod in _ROW_MODULES:
        if name.endswith(mod + ".weight") or name.endswith(mod + ".bias"):
            if shape[0] % tp == 0 and shape[0] >= tp:
                return PSpec("model", *([None] * (len(shape) - 1)))
            return PSpec()
    for mod in _COL_MODULES:
        if name.endswith(mod + ".weight"):
            if len(shape) >= 2 and shape[1] % tp == 0 and shape[1] >= tp:
                return PSpec(None, "model", *([None] * (len(shape) - 2)))
            return PSpec()
    return PSpec()


def tp_param_shardings(mesh: Mesh, params: Dict[str, jax.Array],
                       ) -> Dict[str, NamedSharding]:
    """Per-leaf NamedShardings for a flat param dict (replicated where the
    rules don't apply or don't divide)."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    return {name: NamedSharding(mesh, tp_spec(name, getattr(x, "shape", ()), tp))
            for name, x in params.items()}


def shard_params(mesh: Mesh, params: Dict[str, jax.Array]
                 ) -> Dict[str, jax.Array]:
    """device_put the params with the TP layout."""
    sh = tp_param_shardings(mesh, params)
    return {k: jax.device_put(v, sh[k]) for k, v in params.items()}


def count_sharded(params_or_shardings: Dict[str, object]) -> int:
    """How many leaves actually split over the model axis (diagnostics)."""
    n = 0
    for v in params_or_shardings.values():
        spec = getattr(getattr(v, "sharding", v), "spec", None)
        if spec is not None and "model" in str(spec):
            n += 1
    return n


def compose_zero2(mesh: Mesh, params: Dict[str, jax.Array],
                  base: Optional[Dict[str, NamedSharding]] = None,
                  ) -> Dict[str, NamedSharding]:
    """ZeRO-2 layout on top of a TP layout: shard one additional free axis of
    each leaf over dp when it divides evenly; leaves keep their TP split.

    With base=None this degenerates to the plain ZeRO-2 rule
    (full_trainer.zero2_sharding) expressed per-name."""
    dp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("dp", 1)
    base = base or {k: NamedSharding(mesh, PSpec()) for k in params}
    out = {}
    for name, x in params.items():
        shape = getattr(x, "shape", ())
        spec = list(base[name].spec) + [None] * (len(shape) - len(base[name].spec))
        if dp > 1:
            for axis, dim in enumerate(shape):
                if spec[axis] is None and dim % dp == 0 and dim >= dp:
                    spec[axis] = "dp"
                    break
        out[name] = NamedSharding(mesh, PSpec(*spec))
    return out


def stack_experts(params: Dict[str, jax.Array], n_expert: int
                  ) -> Dict[str, jax.Array]:
    """Convert per-expert MoE weights (``...experts.{i}.w_1.weight`` — the
    torch naming) into the stacked expert-parallel layout
    (``...experts_stacked.w_1.weight`` of shape (E, ...)) consumed by
    layers/conformer.moe_ffn.  Non-MoE leaves pass through unchanged."""
    import re

    import jax.numpy as jnp

    out = dict(params)
    pat = re.compile(r"^(.*\.experts)\.0\.(w_[12]\.(?:weight|bias))$")
    for name in list(params):
        m = pat.match(name)
        if not m:
            continue
        prefix, leaf = m.group(1), m.group(2)
        stacked = jnp.stack([params[f"{prefix}.{i}.{leaf}"]
                             for i in range(n_expert)])
        out[f"{prefix}_stacked.{leaf}"] = stacked
        for i in range(n_expert):
            out.pop(f"{prefix}.{i}.{leaf}")
    return out
