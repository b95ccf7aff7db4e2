"""Pallas flash-attention kernel vs the XLA einsum reference (interpret mode
on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from cosy_tpu.ops.flash_attention import flash_attention


def reference_attention(q, k, v, bias, scale):
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) * scale
    if bias is not None:
        s = s + bias[:, None]
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", a, v)


def test_flash_matches_reference_with_bias():
    rng = np.random.default_rng(0)
    B, H, T, S, d = 2, 3, 100, 150, 32
    q = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, S, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, d)).astype(np.float32))
    bias = np.zeros((B, T, S), np.float32)
    bias[1, :, -30:] = -1e10
    bias = jnp.asarray(bias)
    scale = d ** -0.5

    want = reference_attention(q, k, v, bias, scale)
    got = flash_attention(q, k, v, bias, scale, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_k_valid_no_bias():
    rng = np.random.default_rng(2)
    B, H, T, d = 2, 2, 80, 32
    q = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    k_valid = jnp.asarray([80, 55], jnp.int32)
    bias = np.zeros((B, T, T), np.float32)
    bias[1, :, 55:] = -1e10
    want = reference_attention(q, k, v, jnp.asarray(bias), d ** -0.5)
    got = flash_attention(q, k, v, None, d ** -0.5, k_valid=k_valid,
                          block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_fully_masked_rows_are_finite():
    rng = np.random.default_rng(1)
    B, H, T, d = 1, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    bias = jnp.full((B, T, T), -1e10)
    out = flash_attention(q, k, v, bias, d ** -0.5, block_q=64, block_k=64, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_flash_qblocked_path_large_s():
    """MAX_ONE_TILE_S < S <= MAX_QBLOCK_S exercises the q-blocked one-tile
    kernel (whole S per q block, no online-softmax loop)."""
    from cosy_tpu.ops.flash_attention import MAX_ONE_TILE_S

    rng = np.random.default_rng(3)
    B, H, T, d = 1, 2, 64, 32
    S = MAX_ONE_TILE_S + 64
    q = jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    k_valid = jnp.asarray([S - 100], jnp.int32)
    got = flash_attention(q, k, v, None, d ** -0.5, k_valid=k_valid,
                          block_q=64, block_k=128, interpret=True)
    bias = np.zeros((B, T, S), np.float32)
    bias[:, :, S - 100:] = -1e10
    want = reference_attention(q, k, v, jnp.asarray(bias), d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_qblocked_multiblock_with_bias():
    """Multiple q blocks (T > block_q) + bias + T not block-aligned."""
    from cosy_tpu.ops import flash_attention as fa

    Sp = 1280
    bq = fa._qblock_for(Sp, True)
    rng = np.random.default_rng(7)
    B, H, d = 1, 2, 32
    T, S = 2 * bq + 40, fa.MAX_ONE_TILE_S + 100
    q = jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    bias = np.zeros((B, T, S), np.float32)
    bias[:, :, -50:] = -1e10
    bias[:, 5, :10] = -1e10
    got = flash_attention(q, k, v, jnp.asarray(bias), d ** -0.5, interpret=True)
    want = reference_attention(q, k, v, jnp.asarray(bias), d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_streaming_path_very_large_s():
    """S > MAX_QBLOCK_S falls back to the online-softmax streaming kernel."""
    from cosy_tpu.ops.flash_attention import MAX_QBLOCK_S

    rng = np.random.default_rng(8)
    B, H, T, d = 1, 1, 16, 32
    S = MAX_QBLOCK_S + 128
    q = jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    k_valid = jnp.asarray([S - 200], jnp.int32)
    got = flash_attention(q, k, v, None, d ** -0.5, k_valid=k_valid,
                          block_q=16, block_k=128, interpret=True)
    bias = np.zeros((B, T, S), np.float32)
    bias[:, :, S - 200:] = -1e10
    want = reference_attention(q, k, v, jnp.asarray(bias), d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_one_tile_path_matches_reference():
    rng = np.random.default_rng(4)
    B, H, T, S, d = 2, 2, 96, 130, 32
    q = jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    bias = np.zeros((B, T, S), np.float32)
    bias[:, :, -30:] = -1e10
    got = flash_attention(q, k, v, jnp.asarray(bias), d ** -0.5, interpret=True)
    want = reference_attention(q, k, v, jnp.asarray(bias), d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_use_flash_gate(monkeypatch):
    """Default-on exactly in the measured-win band (T=1024 est-level A/B),
    off elsewhere; env forces win over the band."""
    from cosy_tpu.ops import flash_attention as fa

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("COSY_TPU_FLASH", raising=False)
    assert fa.use_flash(1024, 64)
    assert fa.use_flash(1100, 64)
    assert fa.use_flash(2048, 64)          # q-blocked band (1.26x at T2048)
    assert fa.use_flash(fa.MAX_QBLOCK_S, 64)
    assert not fa.use_flash(512, 64)       # in-context loss at T<=512
    assert not fa.use_flash(fa.MAX_QBLOCK_S + 1, 64)  # streaming would lose
    assert not fa.use_flash(1024, 63)      # lane-misaligned head dim
    monkeypatch.setenv("COSY_TPU_FLASH", "0")
    assert not fa.use_flash(1024, 64)
    monkeypatch.setenv("COSY_TPU_FLASH", "1")
    assert fa.use_flash(512, 64)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.delenv("COSY_TPU_FLASH", raising=False)
    assert not fa.use_flash(1024, 64)
