"""Off-path registry variants vs recorded torch outputs: the PE family
(embedding.py:26-199) and conv subsampling (subsampling.py:116-336)."""

import jax.numpy as jnp
import numpy as np

from cosy_tpu.layers import posenc as PE
from cosy_tpu.layers import subsampling as SS
from cosy_tpu.params import P
from test_parity import GOLDEN_DIR, assert_close


def _load(name):
    blob = np.load(f"{GOLDEN_DIR}/{name}.npz")
    return {k.split(":", 1)[0] + ":" + k.split(":", 1)[1]: blob[k] for k in blob.files}


def test_pos_encoding_family():
    g = _load("pos_encodings")
    x = jnp.asarray(g["in:x"], jnp.float32)

    y, pos = PE.abs_pos_encoding(x)
    assert_close(y, g["out:abs_y"], name="abs")
    assert_close(pos, g["out:abs_pos"], name="abs_pos")
    y3, _ = PE.abs_pos_encoding(x[:, :5], offset=3)
    assert_close(y3, g["out:abs_y_off3"], name="abs_off3")

    y, pos = PE.whisper_pos_encoding(x)
    assert_close(y, g["out:whisper_y"], name="whisper")
    assert_close(pos, g["out:whisper_pos"], name="whisper_pos")
    y3, _ = PE.whisper_pos_encoding(x[:, :5], offset=3)
    assert_close(y3, g["out:whisper_y_off3"], name="whisper_off3")

    lp = jnp.asarray(g["in:learnable_pe"], jnp.float32)
    y, pos = PE.learnable_pos_encoding(lp, x)
    assert_close(y, g["out:learnable_y"], name="learnable")
    y3, _ = PE.learnable_pos_encoding(lp, x[:, :5], offset=3)
    assert_close(y3, g["out:learnable_y_off3"], name="learnable_off3")

    y, pos = PE.no_pos_encoding(x)
    assert_close(y, g["out:nope_y"], name="nope")
    assert np.all(np.asarray(pos) == 0)


def test_conv_subsampling_family():
    g = _load("subsampling")
    x = jnp.asarray(g["in:x"], jnp.float32)
    mask = jnp.asarray(g["in:mask"])

    for kind, (fn, rate, _rc) in SS.SUBSAMPLE_RATES.items():
        params = {k.split(".", 1)[1]: jnp.asarray(v, jnp.float32)
                  for k, v in ((kk[len("param:"):], vv) for kk, vv in g.items()
                               if kk.startswith("param:" + kind + "."))}
        y, m2 = fn(P(params), x, mask)
        assert_close(y, g[f"out:{kind}_y"], atol=5e-4, rtol=5e-4, name=kind)
        np.testing.assert_array_equal(np.asarray(m2), g[f"out:{kind}_mask"],
                                      err_msg=kind + "_mask")
        assert y.shape[1] == g[f"out:{kind}_y"].shape[1]


def test_init_shapes_match_goldens():
    from cosy_tpu.params import KeyGen
    import jax

    g = _load("subsampling")
    for kind in SS.SUBSAMPLE_RATES:
        params = {}
        SS.init_conv_subsampling(KeyGen(jax.random.PRNGKey(0)), params, "", kind,
                                 idim=16, odim=12)
        want = {k[len("param:" + kind + "."):]: v.shape for k, v in g.items()
                if k.startswith("param:" + kind + ".")}
        got = {k: v.shape for k, v in params.items()}
        assert got == want, (kind, got, want)
