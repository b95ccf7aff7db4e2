"""HiFT vocoder parity vs the recorded reference decode (deterministic part)."""

import numpy as np
import jax.numpy as jnp

from cosy_tpu.config import HiFTConfig
from cosy_tpu.compat import fold_weight_norm
from cosy_tpu.ctx import EVAL
from cosy_tpu.params import P
from cosy_tpu.models.hift import f0_predict, hift_decode

from test_parity import load_golden, assert_close

HIFT_CFG = HiFTConfig(
    in_channels=6, base_channels=16, nb_harmonics=2,
    upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    source_resblock_kernel_sizes=(3, 3), source_resblock_dilation_sizes=((1,), (1,)),
    f0_predictor_cond_channels=8,
)


def test_hift_f0_and_decode():
    params, ins, outs = load_golden("hift_decode")
    params = fold_weight_norm(params)
    p = P(params)

    f0 = f0_predict(p.sub("f0_predictor"), jnp.asarray(ins["mel"]))
    assert_close(f0, outs["f0"], name="f0")

    wav = hift_decode(p, HIFT_CFG, jnp.asarray(ins["mel"]), jnp.asarray(ins["s"]))
    assert wav.shape == outs["wav"].shape, (wav.shape, outs["wav"].shape)
    assert_close(wav, outs["wav"], atol=5e-4, rtol=5e-3, name="wav")


def test_gemm_convs_match_xla_convs():
    """conv1d_gemm (im2col GEMM formulation) is numerically the same conv:
    unit-level across kernel/dilation/padding combos, and the whole
    hift_decode under HiFTConfig.gemm_convs matches the default path."""
    import dataclasses as _dc

    from cosy_tpu.layers.basic import conv1d, conv1d_gemm
    from cosy_tpu.params import P as _P

    rng = np.random.default_rng(0)
    for (cin, cout, k, d, pad, t) in [(4, 6, 3, 1, 1, 17), (6, 4, 7, 3, 9, 33),
                                      (8, 8, 11, 5, 25, 40), (5, 3, 1, 1, 0, 9)]:
        params = {"c.weight": jnp.asarray(
                      rng.standard_normal((cout, cin, k)), jnp.float32),
                  "c.bias": jnp.asarray(rng.standard_normal((cout,)),
                                        jnp.float32)}
        x = jnp.asarray(rng.standard_normal((2, cin, t)), jnp.float32)
        want = conv1d(_P(params), "c", x, padding=pad, dilation=d)
        got = conv1d_gemm(_P(params), "c", x, padding=pad, dilation=d)
        assert got.shape == want.shape, (k, d, pad)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    params, ins, outs = load_golden("hift_decode")
    params = fold_weight_norm(params)
    p = P(params)
    got = hift_decode(p, _dc.replace(HIFT_CFG, gemm_convs=True),
                      jnp.asarray(ins["mel"]), jnp.asarray(ins["s"]))
    # the GEMM path must hit the same reference golden as the conv path
    assert_close(got, outs["wav"], atol=5e-4, rtol=5e-3, name="wav_gemm")
