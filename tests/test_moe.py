"""MoE feed-forward (positionwise_feed_forward.py:58-115): the dense TPU
formulation must equal the reference's per-expert gather loop, re-derived
here in numpy."""

import numpy as np
import jax
import jax.numpy as jnp

from cosy_tpu.layers.conformer import moe_ffn
from cosy_tpu.params import P, KeyGen, init_linear


def _np_reference(params, xs, n_expert, k):
    """Reference math: router -> top-k -> softmax over selected logits ->
    sum of gathered expert outputs (torch loop, re-expressed densely)."""
    router = xs @ params["moe.gate.weight"].T
    order = np.argsort(-router, axis=1, kind="stable")[:, :k]
    logits = np.take_along_axis(router, order, axis=1)
    w = np.exp(logits - logits.max(axis=1, keepdims=True))
    w = w / w.sum(axis=1, keepdims=True)
    out = np.zeros_like(xs)
    for i in range(n_expert):
        h = np.maximum(xs @ params[f"moe.experts.{i}.w_1.weight"].T
                       + params[f"moe.experts.{i}.w_1.bias"], 0.0)
        y = h @ params[f"moe.experts.{i}.w_2.weight"].T \
            + params[f"moe.experts.{i}.w_2.bias"]
        wi = np.where(order == i, w, 0.0).sum(axis=1)
        out += wi[:, None] * y
    return out


def test_moe_ffn_matches_reference_math():
    D, F, E, K = 8, 16, 4, 2
    kg = KeyGen(jax.random.PRNGKey(0))
    params = {}
    init_linear(kg(), params, "moe.gate", D, E, bias=False)
    for i in range(E):
        init_linear(kg(), params, f"moe.experts.{i}.w_1", D, F)
        init_linear(kg(), params, f"moe.experts.{i}.w_2", F, D)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, D))
    y = moe_ffn(P(params), "moe", x, E, K, jax.nn.relu, 0.0,
                __import__("cosy_tpu.ctx", fromlist=["EVAL"]).EVAL)

    np_params = {k_: np.asarray(v) for k_, v in params.items()}
    ref = _np_reference(np_params, np.asarray(x).reshape(-1, D), E, K)
    np.testing.assert_allclose(np.asarray(y).reshape(-1, D), ref,
                               atol=1e-5, rtol=1e-5)
