"""mask=None (dense fast path) must be numerically identical to an all-ones
mask through the estimator and the Euler solve.

The fast path (unet.py `_mul_mask`, flow.py `cfm_solve_euler`) elides the
masking multiplies and the (B, T, T) padding bias for full-valid batches —
inference over exact-length utterances (flow_inference with even T) and
bench.py's CFM measurement.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cosy_tpu.config import CFMConfig, EstimatorConfig, FlowConfig
from cosy_tpu.ctx import EVAL
from cosy_tpu.layers.unet import conditional_decoder, init_conditional_decoder
from cosy_tpu.models import flow as Fl
from cosy_tpu.params import P, KeyGen


EST_CFG = EstimatorConfig(
    in_channels=24, out_channels=6, channels=(16, 16), dropout=0.0,
    attention_head_dim=4, n_blocks=1, num_mid_blocks=2, num_heads=2,
    act_fn="gelu",
)


def _make(key, B=2, T=16):
    params = {}
    init_conditional_decoder(KeyGen(key), params, "", EST_CFG)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, 6, T))
    mu = jax.random.normal(ks[1], (B, 12, T))
    t = jax.random.uniform(ks[2], (B,))
    spks = jax.random.normal(ks[3], (B, 2))
    cond = jax.random.normal(ks[4], (B, 4, T))
    return params, x, mu, t, spks, cond


def test_estimator_dense_equals_ones_mask():
    params, x, mu, t, spks, cond = _make(jax.random.PRNGKey(0))
    ones = jnp.ones((x.shape[0], 1, x.shape[-1]), x.dtype)
    y_mask = conditional_decoder(P(params), EST_CFG, x, ones, mu, t, spks, cond, EVAL)
    y_none = conditional_decoder(P(params), EST_CFG, x, None, mu, t, spks, cond, EVAL)
    np.testing.assert_allclose(np.asarray(y_none), np.asarray(y_mask),
                               atol=1e-6, rtol=1e-6)


def test_estimator_dense_streaming_equals_ones_mask():
    params, x, mu, t, spks, cond = _make(jax.random.PRNGKey(1))
    ones = jnp.ones((x.shape[0], 1, x.shape[-1]), x.dtype)
    kw = dict(streaming=True, static_chunk_size=4)
    y_mask = conditional_decoder(P(params), EST_CFG, x, ones, mu, t, spks, cond, EVAL, **kw)
    y_none = conditional_decoder(P(params), EST_CFG, x, None, mu, t, spks, cond, EVAL, **kw)
    np.testing.assert_allclose(np.asarray(y_none), np.asarray(y_mask),
                               atol=1e-6, rtol=1e-6)


def test_estimator_dense_prompt_isolation_equals_ones_mask():
    params, x, mu, t, spks, cond = _make(jax.random.PRNGKey(2))
    ones = jnp.ones((x.shape[0], 1, x.shape[-1]), x.dtype)
    pl = jnp.asarray([5, 5])
    y_mask = conditional_decoder(P(params), EST_CFG, x, ones, mu, t, spks, cond, EVAL,
                                 prompt_lens=pl)
    y_none = conditional_decoder(P(params), EST_CFG, x, None, mu, t, spks, cond, EVAL,
                                 prompt_lens=pl)
    np.testing.assert_allclose(np.asarray(y_none), np.asarray(y_mask),
                               atol=1e-6, rtol=1e-6)


def test_euler_solve_dense_equals_ones_mask():
    cfg = FlowConfig(
        output_size=80,
        estimator=EstimatorConfig(
            in_channels=320, out_channels=80, channels=(16, 16), dropout=0.0,
            attention_head_dim=4, n_blocks=1, num_mid_blocks=1, num_heads=2,
            act_fn="gelu",
        ),
        cfm=CFMConfig(inference_cfg_rate=0.7),
    )
    key = jax.random.PRNGKey(3)
    params = {}
    init_conditional_decoder(KeyGen(key), params, "", cfg.estimator)
    B, T = 2, 16
    ks = jax.random.split(key, 4)
    z = jax.random.normal(ks[0], (B, 80, T))
    mu = jax.random.normal(ks[1], (B, 80, T))
    spks = jax.random.normal(ks[2], (B, 80))
    cond = jax.random.normal(ks[3], (B, 80, T))
    ones = jnp.ones((B, 1, T))
    y_mask = Fl.cfm_solve_euler(P(params), cfg, z, ones, mu, spks, cond, 4, EVAL)
    y_none = Fl.cfm_solve_euler(P(params), cfg, z, None, mu, spks, cond, 4, EVAL)
    np.testing.assert_allclose(np.asarray(y_none), np.asarray(y_mask),
                               atol=1e-6, rtol=1e-6)


def test_estimator_three_level_streaming_dense():
    """3-level U-Net with streaming chunk bias: per-level lengths follow the
    iterated ceil(T/2) of the stride-2 downsamples (a plain T >> l would
    build mismatched biases for odd intermediate lengths), and the dense
    fast path must still equal the all-ones-mask run."""
    cfg3 = EstimatorConfig(
        in_channels=24, out_channels=6, channels=(16, 16, 16), dropout=0.0,
        attention_head_dim=4, n_blocks=1, num_mid_blocks=1, num_heads=2,
        act_fn="gelu",
    )
    key = jax.random.PRNGKey(5)
    params = {}
    init_conditional_decoder(KeyGen(key), params, "", cfg3)
    B, T = 2, 18  # levels: 18 -> 9 -> 5 (ceil), not 18 -> 9 -> 4 (shift)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, 6, T))
    mu = jax.random.normal(ks[1], (B, 12, T))
    t = jax.random.uniform(ks[2], (B,))
    spks = jax.random.normal(ks[3], (B, 2))
    cond = jax.random.normal(ks[4], (B, 4, T))
    ones = jnp.ones((B, 1, T))
    kw = dict(streaming=True, static_chunk_size=4)
    y_mask = conditional_decoder(P(params), cfg3, x, ones, mu, t, spks, cond, EVAL, **kw)
    y_none = conditional_decoder(P(params), cfg3, x, None, mu, t, spks, cond, EVAL, **kw)
    assert y_mask.shape == (B, 6, T)
    np.testing.assert_allclose(np.asarray(y_none), np.asarray(y_mask),
                               atol=1e-6, rtol=1e-6)
