"""Banded (windowed) estimator attention — opt-in long-utterance speedup.

The Pallas kernel (ops/flash_attention.banded_attention) must match the XLA
oracle (full attention + ops/masks.band_bias) exactly on the valid region;
the conditional_decoder plumbing must engage only on the dense inference
path and normalize window >= T to exactly full attention.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosy_tpu.config import EstimatorConfig, replace
from cosy_tpu.ctx import Ctx
from cosy_tpu.ops import masks as M
from cosy_tpu.ops.flash_attention import banded_attention, banded_block, use_banded
from cosy_tpu.params import KeyGen, P
from cosy_tpu.layers.unet import conditional_decoder, init_conditional_decoder


def _full_attention(q, k, v, scale, bias):
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) * scale
    if bias is not None:
        s = s + bias[:, None].astype(jnp.float32)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", a, v)


def _qkv(B=2, H=3, T=384, d=64, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
            for _ in range(3)]


def test_banded_kernel_matches_band_bias_oracle():
    q, k, v = _qkv()
    B, _, T, _ = q.shape
    window = 96
    band = jnp.broadcast_to(M.band_bias(T, window, jnp.float32)[None], (B, T, T))
    ref = _full_attention(q, k, v, 0.125, band)
    out = banded_attention(q, k, v, 0.125, window, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_banded_kernel_unaligned_T_and_k_valid():
    # T not a multiple of the 128-aligned block; per-batch valid key lengths
    q, k, v = _qkv(B=2, H=2, T=300, d=8, seed=1)
    B, _, T, _ = q.shape
    window = 64
    k_valid = jnp.asarray([300, 217], jnp.int32)
    band = M.band_bias(T, window, jnp.float32)[None]
    pad = M.mask_to_bias(jnp.arange(T)[None, None, :] < k_valid[:, None, None],
                         jnp.float32)
    ref = _full_attention(q, k, v, 0.3, band + pad)
    out = banded_attention(q, k, v, 0.3, window, k_valid=k_valid, interpret=True)
    # rows beyond k_valid attend only inside their own (masked) tail band —
    # compare the valid query rows per batch entry
    for b in range(B):
        n = int(k_valid[b])
        np.testing.assert_allclose(np.asarray(out)[b, :, :n], np.asarray(ref)[b, :, :n],
                                   rtol=3e-5, atol=3e-5)


def test_band_bias_window_covering_T_is_full_attention():
    q, k, v = _qkv(B=1, H=2, T=96, d=16, seed=2)
    T = q.shape[2]
    full = _full_attention(q, k, v, 0.25, None)
    band = jnp.broadcast_to(M.band_bias(T, T, jnp.float32)[None], (1, T, T))
    banded = _full_attention(q, k, v, 0.25, band)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(full), rtol=1e-6, atol=1e-6)


def test_use_banded_gate_shapes():
    # CPU backend: never engages (oracle path instead)
    assert not use_banded(2560, 64, 256) or jax.default_backend() == "tpu"
    # block size: 128-aligned, >= window
    assert banded_block(256) == 256
    assert banded_block(100) == 128


def _tiny_cfg(**kw):
    return replace(EstimatorConfig(
        in_channels=16, out_channels=4, channels=(8, 8), attention_head_dim=4,
        n_blocks=1, num_mid_blocks=1, num_heads=2, act_fn="gelu",
    ), **kw)


def _run_decoder(cfg, T=64, seed=0):
    kg = KeyGen(jax.random.PRNGKey(7))
    d = {}
    init_conditional_decoder(kg, d, "", cfg)
    p = P(d)
    rng = np.random.default_rng(seed)
    B = 2
    x = jnp.asarray(rng.standard_normal((B, 4, T)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, 4, T)), jnp.float32)
    spks = jnp.asarray(rng.standard_normal((B, 4)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, 4, T)), jnp.float32)
    t = jnp.asarray([0.3, 0.8], jnp.float32)
    return conditional_decoder(p, cfg, x, None, mu, t, spks, cond)


def test_decoder_window_covering_T_is_exactly_full():
    full = _run_decoder(_tiny_cfg())
    wide = _run_decoder(_tiny_cfg(attn_window=4096))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(wide))


def test_decoder_window_changes_output_and_is_finite():
    full = _run_decoder(_tiny_cfg())
    win = _run_decoder(_tiny_cfg(attn_window=8))
    assert np.all(np.isfinite(np.asarray(win)))
    assert not np.allclose(np.asarray(win), np.asarray(full))


def test_decoder_window_ignored_in_training():
    cfg = _tiny_cfg(attn_window=8)
    kg = KeyGen(jax.random.PRNGKey(7))
    d = {}
    init_conditional_decoder(kg, d, "", cfg)
    p = P(d)
    rng = np.random.default_rng(3)
    B, T = 2, 64
    args = [jnp.asarray(rng.standard_normal((B, 4, T)), jnp.float32),
            None,
            jnp.asarray(rng.standard_normal((B, 4, T)), jnp.float32),
            jnp.asarray([0.3, 0.8], jnp.float32),
            jnp.asarray(rng.standard_normal((B, 4)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, 4, T)), jnp.float32)]
    ctx = Ctx(rng=jax.random.PRNGKey(0), train=True)
    out_w = conditional_decoder(p, cfg, args[0], args[1], args[2], args[3],
                                args[4], args[5], ctx=ctx)
    ctx2 = Ctx(rng=jax.random.PRNGKey(0), train=True)
    out_f = conditional_decoder(p, _tiny_cfg(), args[0], args[1], args[2], args[3],
                                args[4], args[5], ctx=ctx2)
    np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_f))


def test_env_override_forces_off(monkeypatch):
    monkeypatch.setenv("COSY_TPU_ATTN_WINDOW", "0")
    full = _run_decoder(_tiny_cfg())
    win = _run_decoder(_tiny_cfg(attn_window=8))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(win))
