"""Deterministic per-name parameter values for seeded goldens.

Large-topology goldens (the reference UpsampleConformerEncoder hard-codes 512
channels, upsample_encoder.py:225-237) would be ~20 MB if weights were stored.
Instead the generator (tools/make_goldens2.py) fills the torch module from
these per-name seeded values and stores only shapes + inputs + outputs; the
test reconstructs the identical parameters here.  Values are f16-quantized so
torch(f32-from-f16) and jax(f32-from-f16) see bit-identical weights.
"""

import zlib

import numpy as np


def seeded_param(name: str, shape) -> np.ndarray:
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    vals = rng.standard_normal(tuple(int(s) for s in shape)).astype(np.float32)
    lname = name.rsplit(".", 1)
    is_weight = lname[-1] == "weight"
    if is_weight and len(shape) == 1:      # norm scale: keep near 1
        vals = 1.0 + 0.1 * vals
    elif len(shape) == 1:                  # bias
        vals = 0.05 * vals
    else:                                  # matmul / conv weight
        fan_in = int(np.prod(shape[1:]))
        vals = vals / np.sqrt(max(fan_in, 1))
    return vals.astype(np.float16).astype(np.float32)
