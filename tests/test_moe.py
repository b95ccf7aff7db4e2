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


def test_moe_stacked_experts_match_per_expert():
    """The stacked expert-parallel layout computes the same function as the
    per-expert torch-named weights (layers/conformer.moe_ffn stacked path)."""
    from cosy_tpu.ctx import EVAL
    from cosy_tpu.parallel.tp import stack_experts

    D, F, E, K = 8, 16, 4, 2
    kg = KeyGen(jax.random.PRNGKey(0))
    params = {}
    init_linear(kg(), params, "moe.gate", D, E, bias=False)
    for i in range(E):
        init_linear(kg(), params, f"moe.experts.{i}.w_1", D, F)
        init_linear(kg(), params, f"moe.experts.{i}.w_2", F, D)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, D))
    y_loop = moe_ffn(P(params), "moe", x, E, K, jax.nn.relu, 0.0, EVAL)

    stacked = stack_experts(params, E)
    assert "moe.experts_stacked.w_1.weight" in stacked
    assert stacked["moe.experts_stacked.w_1.weight"].shape == (E, F, D)
    assert not any(".experts.0." in k for k in stacked)
    y_stacked = moe_ffn(P(stacked), "moe", x, E, K, jax.nn.relu, 0.0, EVAL)
    np.testing.assert_allclose(np.asarray(y_stacked), np.asarray(y_loop),
                               atol=1e-5, rtol=1e-5)


def test_moe_expert_parallel_sharded_matches_replicated():
    """EP over the mesh model axis: expert weights shard their E axis; the
    routed combine's contraction over E becomes an XLA psum — outputs equal
    the unsharded run (GSPMD is a layout annotation, not a numerics change)."""
    from cosy_tpu.ctx import EVAL
    from cosy_tpu.parallel import mesh as pmesh
    from cosy_tpu.parallel.tp import shard_params, stack_experts, tp_spec

    D, F, E, K = 8, 16, 4, 2
    kg = KeyGen(jax.random.PRNGKey(0))
    params = {}
    init_linear(kg(), params, "moe.gate", D, E, bias=False)
    for i in range(E):
        init_linear(kg(), params, f"moe.experts.{i}.w_1", D, F)
        init_linear(kg(), params, f"moe.experts.{i}.w_2", F, D)
    stacked = stack_experts(params, E)

    # the EP rule engages on the stacked leaves
    assert str(tp_spec("moe.experts_stacked.w_1.weight", (E, F, D), 2)) \
        == "PartitionSpec('model', None, None)"

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, D))
    want = moe_ffn(P(stacked), "moe", x, E, K, jax.nn.relu, 0.0, EVAL)

    mesh = pmesh.make_mesh(dp=1, model=2, devices=jax.devices("cpu")[:2])
    sharded = shard_params(mesh, stacked)
    n_ep = sum(1 for k, v in sharded.items()
               if "experts_stacked" in k and "model" in str(v.sharding.spec))
    assert n_ep == 4, n_ep  # w_1/w_2 weight+bias all split the E axis
    got = jax.jit(lambda p, x: moe_ffn(P(p), "moe", x, E, K, jax.nn.relu,
                                       0.0, EVAL))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
