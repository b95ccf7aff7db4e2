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
