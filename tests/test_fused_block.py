"""Fused whole-block Pallas kernel (ops/fused_block.py) vs the XLA
basic_transformer_block path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from cosy_tpu.ctx import EVAL
from cosy_tpu.layers.unet import basic_transformer_block
from cosy_tpu.ops.fused_block import fused_transformer_block, use_fused_block
from cosy_tpu.params import P, KeyGen, init_linear


def _block_params(C=32, heads=2, dh=8, ff=64):
    inner = heads * dh
    kg = KeyGen(jax.random.PRNGKey(0))
    d = {}
    for n in ("norm1", "norm3"):
        d[f"blk.{n}.weight"] = jax.random.normal(kg(), (C,)) * 0.1 + 1.0
        d[f"blk.{n}.bias"] = jax.random.normal(kg(), (C,)) * 0.1
    for qkv in ("to_q", "to_k", "to_v"):
        init_linear(kg(), d, f"blk.attn1.{qkv}", C, inner, bias=False)
    init_linear(kg(), d, "blk.attn1.to_out.0", inner, C)
    init_linear(kg(), d, "blk.ff.net.0.proj", C, ff)
    init_linear(kg(), d, "blk.ff.net.2", ff, C)
    return d, inner


def _run_fused(d, x, bias, heads, inner, interpret=True):
    sp = P(d).sub("blk")
    return fused_transformer_block(
        x, bias,
        sp["norm1.weight"], sp["norm1.bias"],
        sp["attn1.to_q.weight"], sp["attn1.to_k.weight"], sp["attn1.to_v.weight"],
        sp["attn1.to_out.0.weight"], sp["attn1.to_out.0.bias"],
        sp["norm3.weight"], sp["norm3.bias"],
        sp["ff.net.0.proj.weight"], sp["ff.net.0.proj.bias"],
        sp["ff.net.2.weight"], sp["ff.net.2.bias"],
        heads=heads, scale=(inner // heads) ** -0.5,
        interpret=interpret,
    )


def test_fused_block_matches_xla_no_bias():
    d, inner = _block_params()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    want = basic_transformer_block(P(d), "blk", x, None, 2, "gelu", EVAL)
    got = _run_fused(d, x, None, 2, inner)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_matches_xla_with_bias():
    d, inner = _block_params()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 32))
    bias = np.zeros((2, 16, 16), np.float32)
    bias[1, :, -5:] = -1e10
    want = basic_transformer_block(P(d), "blk", x, jnp.asarray(bias), 2,
                                   "gelu", EVAL)
    got = _run_fused(d, x, jnp.asarray(bias), 2, inner)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_use_fused_block_gate():
    from cosy_tpu.ctx import Ctx

    import cosy_tpu.ops.fused_block as fb

    import os
    from unittest import mock

    # off-chip (CPU) the kernel NEVER engages — not even with the env force:
    # the Mosaic kernel cannot lower off-TPU, so forcing it would crash at
    # pallas_call instead of falling back to XLA
    assert not use_fused_block(512, 256, 512, 1024, "gelu", EVAL, None)
    os.environ["COSY_TPU_FUSED_BLOCK"] = "1"
    try:
        assert not use_fused_block(512, 256, 512, 1024, "gelu", EVAL, None)
    finally:
        del os.environ["COSY_TPU_FUSED_BLOCK"]
    # band/shape/ctx gating, evaluated as if on a TPU backend
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        assert use_fused_block(512, 256, 512, 1024, "gelu", EVAL, None)
        assert use_fused_block(384, 256, 512, 1024, "gelu", EVAL, 3)
        assert not use_fused_block(512, 256, 512, 1024, "gelu", EVAL, 4)
        assert not use_fused_block(500, 256, 512, 1024, "gelu", EVAL, None)
        # outside the measured-win band (T256 0.98x, T1024 VMEM OOM)
        assert not use_fused_block(256, 256, 512, 1024, "gelu", EVAL, None)
        assert not use_fused_block(1024, 256, 512, 1024, "gelu", EVAL, None)
        assert not use_fused_block(512, 250, 512, 1024, "gelu", EVAL, None)
        assert not use_fused_block(512, 256, 512, 1024, "geglu", EVAL, None)
        assert not use_fused_block(
            512, 256, 512, 1024, "gelu",
            Ctx(rng=jax.random.PRNGKey(0), train=True), None)
        os.environ["COSY_TPU_FUSED_BLOCK"] = "0"
        try:
            assert not use_fused_block(512, 256, 512, 1024, "gelu", EVAL, None)
        finally:
            del os.environ["COSY_TPU_FUSED_BLOCK"]
    del fb
