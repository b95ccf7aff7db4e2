"""Flat parameter dictionaries with torch state_dict naming.

The whole framework stores parameters as a single flat ``dict[str, jax.Array]``
whose keys are exactly the torch ``state_dict`` keys of the reference models
(e.g. ``"encoder.encoders.0.self_attn.linear_q.weight"``) and whose values keep
the torch layouts (Linear ``(out, in)``, Conv1d ``(out, in/groups, k)``,
Embedding ``(vocab, dim)``).

Rationale: every convergence bug documented by the reference was a
weight-naming / activation / PE mismatch (reference: README_EN.md:101-183).
Making the param tree *be* the torch state_dict eliminates the name-mapping
layer entirely: checkpoint load, LoRA merged-export, and parity testing are all
identity transforms.  XLA is layout-agnostic — keeping torch layouts costs
nothing on TPU (dot_general contracts any dimension).
"""

from __future__ import annotations

import math
import re
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


class P:
    """Cheap prefixed view over a flat param dict.

    ``P(params, "encoder.")["embed.out.0.weight"]`` reads
    ``params["encoder.embed.out.0.weight"]``.
    """

    __slots__ = ("d", "prefix")

    def __init__(self, d: Params, prefix: str = ""):
        if isinstance(d, P):
            prefix = d.prefix + prefix
            d = d.d
        self.d = d
        self.prefix = prefix

    def __getitem__(self, key: str) -> jax.Array:
        return self.d[self.prefix + key]

    def get(self, key: str, default=None):
        return self.d.get(self.prefix + key, default)

    def __contains__(self, key: str) -> bool:
        return (self.prefix + key) in self.d

    def sub(self, key: str) -> "P":
        return P(self.d, self.prefix + key + ".")

    def full(self, key: str) -> str:
        return self.prefix + key

    def keys(self) -> Iterator[str]:
        for k in self.d:
            if k.startswith(self.prefix):
                yield k[len(self.prefix):]

    def __repr__(self):
        return f"P(prefix={self.prefix!r}, n={sum(1 for _ in self.keys())})"


# ---------------------------------------------------------------------------
# Initializers (torch-compatible defaults, for training from scratch / tests)
# ---------------------------------------------------------------------------


def _kaiming_uniform(key, shape, fan_in, a=math.sqrt(5)):
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_linear(key, d: Params, name: str, in_f: int, out_f: int, bias: bool = True):
    k1, k2 = jax.random.split(key)
    d[name + ".weight"] = _kaiming_uniform(k1, (out_f, in_f), in_f)
    if bias:
        bound = 1.0 / math.sqrt(in_f)
        d[name + ".bias"] = jax.random.uniform(k2, (out_f,), jnp.float32, -bound, bound)


def init_conv1d(key, d: Params, name: str, in_c: int, out_c: int, kernel: int,
                groups: int = 1, bias: bool = True):
    k1, k2 = jax.random.split(key)
    fan_in = (in_c // groups) * kernel
    d[name + ".weight"] = _kaiming_uniform(k1, (out_c, in_c // groups, kernel), fan_in)
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        d[name + ".bias"] = jax.random.uniform(k2, (out_c,), jnp.float32, -bound, bound)


def init_conv_transpose1d(key, d: Params, name: str, in_c: int, out_c: int, kernel: int,
                          bias: bool = True):
    k1, k2 = jax.random.split(key)
    fan_in = out_c * kernel  # torch uses weight shape (in, out, k); fan_in from dim1*k
    d[name + ".weight"] = _kaiming_uniform(k1, (in_c, out_c, kernel), fan_in)
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        d[name + ".bias"] = jax.random.uniform(k2, (out_c,), jnp.float32, -bound, bound)


def init_norm(d: Params, name: str, dim: int):
    d[name + ".weight"] = jnp.ones((dim,), jnp.float32)
    d[name + ".bias"] = jnp.zeros((dim,), jnp.float32)


def init_embedding(key, d: Params, name: str, vocab: int, dim: int):
    d[name + ".weight"] = jax.random.normal(key, (vocab, dim), jnp.float32)


class KeyGen:
    """Deterministic stream of PRNG keys for sequential initialization."""

    def __init__(self, key):
        self.key = key
        self.n = 0

    def __call__(self):
        self.n += 1
        return jax.random.fold_in(self.key, self.n)


# ---------------------------------------------------------------------------
# torch checkpoint IO (compat layer)
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str, dtype=jnp.float32) -> Params:
    """Load a torch ``.pt`` state_dict into a flat JAX param dict.

    Because our param tree uses torch names/layouts verbatim, this is an
    identity transform (reference loader: flow_model.py:726-763).
    """
    import torch  # local import: torch is only needed for compat IO

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state and all(
        not isinstance(v, torch.Tensor) or k == "state_dict" for k, v in state.items()
    ):
        state = state["state_dict"]
    out: Params = {}
    for k, v in state.items():
        if not hasattr(v, "numpy"):
            continue
        out[k] = jnp.asarray(np.asarray(v.detach().to(torch.float32).numpy()), dtype=dtype)
    return out


def save_torch_checkpoint(params: Params, path: str):
    """Save a flat JAX param dict as a torch-loadable ``.pt`` state_dict."""
    import torch

    state = {k: torch.from_numpy(np.array(jax.device_get(v))) for k, v in params.items()}
    torch.save(state, path)


def save_weight_meta(path: str, **meta):
    """Write a ``<path>.meta.json`` provenance sidecar next to a weight file.

    The state dict itself stays byte-compatible with stock CosyVoice loaders
    (reference: merge_joint_weights.py saves plain ``.pt``); provenance that
    consumers need to serve the weights correctly — e.g. whether a flow
    checkpoint operates in normalized mel space (``mel_space: normalized`` for
    fine-tune/distill outputs vs ``raw`` for pretrained-space weights) —
    rides in the sidecar so ``serve.py --flow-weights`` can pick the right
    ``finetuned_norm`` default instead of guessing."""
    import json

    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=0, sort_keys=True)


def load_weight_meta(path: str) -> Optional[dict]:
    """Read the ``<path>.meta.json`` sidecar; None if absent/unreadable."""
    import json

    try:
        with open(path + ".meta.json") as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def strip_prefix(params: Params, prefix: str) -> Params:
    """Select keys under ``prefix`` and strip it (e.g. Lightning ``model.llm.``)."""
    out = {}
    for k, v in params.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def filter_params(params: Params, pattern: str) -> Params:
    rx = re.compile(pattern)
    return {k: v for k, v in params.items() if rx.search(k)}


def num_params(params: Params) -> int:
    return int(sum(int(np.prod(v.shape)) for v in params.values()))


def cast(params: Params, dtype) -> Params:
    return {k: v.astype(dtype) for k, v in params.items()}
