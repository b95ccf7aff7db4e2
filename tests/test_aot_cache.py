"""AOT executable cache (utils/aot.py): persistence + exactness.

The cache must never change results — only skip compilation.  A stale or
corrupt blob falls back to compiling."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosy_tpu.utils import aot


@pytest.fixture()
def aot_dir(tmp_path):
    aot.set_cache_dir(str(tmp_path / "aot"))
    aot.AOT_STATS.update(hits=0, misses=0, errors=0)
    yield str(tmp_path / "aot")
    aot.set_cache_dir(None)


def _fn(x, w, *, scale):
    return jnp.tanh(x @ w) * scale


def test_plain_jit_without_cache_dir():
    aot.set_cache_dir(None)
    f = aot.aot_jit(_fn, static_argnames=("scale",))
    x = jnp.ones((4, 8)); w = jnp.ones((8, 8))
    out = f(x, w, scale=2.0)
    assert out.shape == (4, 8)
    np.testing.assert_allclose(np.asarray(out),
                               np.tanh(np.ones((4, 8)) * 8) * 2, rtol=1e-6)


def test_cache_round_trip_with_statics(aot_dir):
    import os

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((8, 8)),
                    jnp.float32)

    f1 = aot.aot_jit(_fn, static_argnames=("scale",), name="t")
    out1 = np.asarray(f1(x, w, scale=2.0))
    assert aot.AOT_STATS["misses"] == 1
    blobs = [p for p in os.listdir(aot_dir) if p.endswith(".aot")]
    assert len(blobs) == 1 and blobs[0].startswith("t-")

    # a FRESH wrapper (new process stand-in) loads instead of compiling
    f2 = aot.aot_jit(_fn, static_argnames=("scale",), name="t")
    out2 = np.asarray(f2(x, w, scale=2.0))
    assert aot.AOT_STATS["hits"] == 1 and aot.AOT_STATS["misses"] == 1
    np.testing.assert_array_equal(out1, out2)

    # different static value = different program
    f2(x, w, scale=3.0)
    assert aot.AOT_STATS["misses"] == 2
    # repeated call: in-memory, no new loads
    f2(x, w, scale=2.0)
    assert aot.AOT_STATS["hits"] == 1


def test_salt_isolates_configurations(aot_dir):
    """Closures bake config the arg signature cannot see — different salts
    must produce different cache entries (a flipped flag loading a stale
    executable would serve silently wrong results)."""
    import os

    x = jnp.ones((2, 4)); w = jnp.ones((4, 4))
    fa = aot.aot_jit(_fn, static_argnames=("scale",), name="s", salt="cfgA")
    fb = aot.aot_jit(_fn, static_argnames=("scale",), name="s",
                     salt=lambda: "cfgB")  # callable salt (late-bound config)
    fa(x, w, scale=1.0)
    fb(x, w, scale=1.0)
    assert aot.AOT_STATS["misses"] == 2 and aot.AOT_STATS["hits"] == 0
    assert len([p for p in os.listdir(aot_dir) if p.startswith("s-")]) == 2
    # same salt string reloads
    fa2 = aot.aot_jit(_fn, static_argnames=("scale",), name="s", salt="cfgA")
    fa2(x, w, scale=1.0)
    assert aot.AOT_STATS["hits"] == 1


def test_corrupt_blob_falls_back(aot_dir):
    import os

    x = jnp.ones((2, 4)); w = jnp.ones((4, 4))
    f = aot.aot_jit(_fn, static_argnames=("scale",), name="c")
    want = np.asarray(f(x, w, scale=1.0))
    path = [p for p in os.listdir(aot_dir) if p.startswith("c-")][0]
    with open(os.path.join(aot_dir, path), "wb") as fh:
        fh.write(b"garbage")
    f2 = aot.aot_jit(_fn, static_argnames=("scale",), name="c")
    got = np.asarray(f2(x, w, scale=1.0))
    assert aot.AOT_STATS["errors"] >= 1
    np.testing.assert_array_equal(got, want)


def test_pipeline_programs_persist_and_reload(aot_dir):
    """A rebuilt pipeline (server restart stand-in) loads its serving
    programs from the cache; synthesis output stays finite and non-empty."""
    import os

    from test_api import _make_api

    api = _make_api()
    ids = np.asarray([[3, 5, 7]], np.int32)
    zero = np.zeros((1, 12), np.float32)
    list(api.model.synthesize(api._next_rng(), ids, spk_embedding=zero))
    assert aot.AOT_STATS["misses"] > 0
    assert len(os.listdir(aot_dir)) >= aot.AOT_STATS["misses"] - \
        aot.AOT_STATS["errors"]
    m0 = aot.AOT_STATS["misses"]

    api2 = _make_api()
    out = list(api2.model.synthesize(api2._next_rng(), ids,
                                     spk_embedding=zero))
    assert aot.AOT_STATS["hits"] > 0, "rebuilt pipeline did not reload"
    assert aot.AOT_STATS["misses"] == m0, "rebuilt pipeline recompiled"
    wav = out[-1]["tts_speech"]
    assert np.isfinite(wav).all() and wav.size > 0
