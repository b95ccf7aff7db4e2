"""AOT executable cache (utils/aot.py): persistence + exactness.

The cache must never change results — only skip compilation.  A stale or
corrupt blob falls back to compiling.

Every scenario that DESERIALIZES an executable runs in a fresh subprocess:
XLA:CPU's AOT loader itself warns that loading its results can cause
execution errors (machine-feature pseudo-mismatch, cpu_aot_loader.cc) — the
production target is the TPU backend, where executables round-trip cleanly
(PERF.md "AOT executable cache", measured 11/11 loads, zero recompiles).
Sandboxing keeps any loader side effects out of the long-running suite
process."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosy_tpu.utils import aot

_ENV = {**os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "COSY_TPU_NO_CACHE": "1"}
# these tests assert cosy_tpu's OWN aot-cache hit/miss accounting; jax's
# persistent compile cache (default-on for the suite since R5) would make
# the "fresh process recompiles" arms hit ITS disk cache instead and skew
# the miss counters — scrub it from the sandboxed children
_ENV.pop("JAX_COMPILATION_CACHE_DIR", None)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_sandboxed(script: str, cache_dir: str) -> str:
    """Run a scenario in a fresh interpreter; return stdout (asserts inside
    the child; non-zero exit fails the test with the child's output)."""
    proc = subprocess.run(
        [sys.executable, "-c", script], env={**_ENV, "AOT_DIR": cache_dir},
        cwd=_REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


_PRELUDE = """
import os
import numpy as np
import jax, jax.numpy as jnp
from cosy_tpu.utils import aot
aot.set_cache_dir(os.environ["AOT_DIR"])

def _fn(x, w, *, scale):
    return jnp.tanh(x @ w) * scale

x = jnp.ones((4, 8)); w = jnp.ones((8, 8))
"""


def test_plain_jit_without_cache_dir():
    # no deserialization happens on this path — safe in-process
    aot.set_cache_dir(None)

    def _fn(x, w, *, scale):
        return jnp.tanh(x @ w) * scale

    f = aot.aot_jit(_fn, static_argnames=("scale",))
    out = f(jnp.ones((4, 8)), jnp.ones((8, 8)), scale=2.0)
    np.testing.assert_allclose(np.asarray(out),
                               np.tanh(np.ones((4, 8)) * 8) * 2, rtol=1e-6)


def test_cache_round_trip_with_statics(tmp_path):
    out = _run_sandboxed(_PRELUDE + """
f1 = aot.aot_jit(_fn, static_argnames=("scale",), name="t")
o1 = np.asarray(f1(x, w, scale=2.0))
assert aot.AOT_STATS["misses"] == 1, aot.AOT_STATS
blobs = [p for p in os.listdir(os.environ["AOT_DIR"]) if p.endswith(".aot")]
assert len(blobs) == 1 and blobs[0].startswith("t-"), blobs

# a FRESH wrapper (new process stand-in) loads instead of compiling
f2 = aot.aot_jit(_fn, static_argnames=("scale",), name="t")
o2 = np.asarray(f2(x, w, scale=2.0))
assert aot.AOT_STATS["hits"] == 1 and aot.AOT_STATS["misses"] == 1, aot.AOT_STATS
np.testing.assert_array_equal(o1, o2)

# different static value = different program; repeats stay in memory
f2(x, w, scale=3.0)
assert aot.AOT_STATS["misses"] == 2, aot.AOT_STATS
f2(x, w, scale=2.0)
assert aot.AOT_STATS["hits"] == 1, aot.AOT_STATS
print("ROUND_TRIP_OK")
""", str(tmp_path / "aot"))
    assert "ROUND_TRIP_OK" in out


def test_salt_isolates_configurations(tmp_path):
    """Closures bake config the arg signature cannot see — different salts
    must produce different cache entries (a flipped flag loading a stale
    executable would serve silently wrong results)."""
    out = _run_sandboxed(_PRELUDE + """
fa = aot.aot_jit(_fn, static_argnames=("scale",), name="s", salt="cfgA")
fb = aot.aot_jit(_fn, static_argnames=("scale",), name="s",
                 salt=lambda: "cfgB")  # callable salt (late-bound config)
fa(x, w, scale=1.0)
fb(x, w, scale=1.0)
assert aot.AOT_STATS["misses"] == 2 and aot.AOT_STATS["hits"] == 0, aot.AOT_STATS
n = len([p for p in os.listdir(os.environ["AOT_DIR"]) if p.startswith("s-")])
assert n == 2, n
fa2 = aot.aot_jit(_fn, static_argnames=("scale",), name="s", salt="cfgA")
fa2(x, w, scale=1.0)
assert aot.AOT_STATS["hits"] == 1, aot.AOT_STATS
print("SALT_OK")
""", str(tmp_path / "aot"))
    assert "SALT_OK" in out


def test_corrupt_blob_falls_back(tmp_path):
    out = _run_sandboxed(_PRELUDE + """
f = aot.aot_jit(_fn, static_argnames=("scale",), name="c")
want = np.asarray(f(x, w, scale=1.0))
path = [p for p in os.listdir(os.environ["AOT_DIR"]) if p.startswith("c-")][0]
with open(os.path.join(os.environ["AOT_DIR"], path), "wb") as fh:
    fh.write(b"garbage")
f2 = aot.aot_jit(_fn, static_argnames=("scale",), name="c")
got = np.asarray(f2(x, w, scale=1.0))
assert aot.AOT_STATS["errors"] >= 1, aot.AOT_STATS
np.testing.assert_array_equal(got, want)
print("CORRUPT_FALLBACK_OK")
""", str(tmp_path / "aot"))
    assert "CORRUPT_FALLBACK_OK" in out


def test_pipeline_programs_persist_and_reload(tmp_path):
    """A rebuilt pipeline (server restart stand-in) loads its serving
    programs from the cache; synthesis output stays finite and non-empty."""
    out = _run_sandboxed("""
import os, sys
sys.path.insert(0, "tests")
import numpy as np
from cosy_tpu.utils import aot
aot.set_cache_dir(os.environ["AOT_DIR"])
from test_api import _make_api

api = _make_api()
ids = np.asarray([[3, 5, 7]], np.int32)
zero = np.zeros((1, 12), np.float32)
list(api.model.synthesize(api._next_rng(), ids, spk_embedding=zero))
assert aot.AOT_STATS["misses"] > 0, aot.AOT_STATS
m0 = aot.AOT_STATS["misses"]

api2 = _make_api()
out = list(api2.model.synthesize(api2._next_rng(), ids, spk_embedding=zero))
assert aot.AOT_STATS["hits"] > 0, ("rebuilt pipeline did not reload", aot.AOT_STATS)
assert aot.AOT_STATS["misses"] == m0, ("rebuilt pipeline recompiled", aot.AOT_STATS)
wav = out[-1]["tts_speech"]
assert np.isfinite(wav).all() and wav.size > 0
print("PIPELINE_RELOAD_OK")
""", str(tmp_path / "aot"))
    assert "PIPELINE_RELOAD_OK" in out


def test_fingerprint_includes_source_hash():
    """Code edits must invalidate blobs automatically (ADVICE r3 #1): the
    fingerprint folds in a hash over every package .py source."""
    fp = aot._fingerprint()
    assert "|src" in fp
    # deterministic within a process
    assert aot._source_hash() == aot._source_hash()


def test_untrusted_cache_dir_refuses_load(tmp_path, monkeypatch):
    """A group/world-writable cache dir must never be unpickled from
    (ADVICE r3 #2) — the call still works, it just recompiles."""
    d = tmp_path / "aotcache"
    aot.set_cache_dir(str(d))
    try:
        assert aot._dir_is_trusted(str(d))  # created 0700
        f = aot.aot_jit(lambda x: x * 2.0, name="trustcheck")
        x = jnp.ones((4,), jnp.float32)
        np.testing.assert_allclose(np.asarray(f(x)), 2.0)
        os.chmod(d, 0o777)
        assert not aot._dir_is_trusted(str(d))
        before = dict(aot.AOT_STATS)
        g = aot.aot_jit(lambda x: x * 2.0, name="trustcheck")
        np.testing.assert_allclose(np.asarray(g(x)), 2.0)
        # same signature + name, but the world-writable dir forced a
        # compile (miss), not a pickle load (hit)
        assert aot.AOT_STATS["hits"] == before["hits"]
        assert aot.AOT_STATS["misses"] == before["misses"] + 1
    finally:
        aot.set_cache_dir(None)


def test_int8_decode_programs_persist_and_reload(tmp_path):
    """The --int8 serving path composed with the AOT cache (VERDICT r3 next
    #4): int8 decode programs persist, a rebuilt pipeline reloads them with
    zero recompiles and bit-identical tokens, and the int8 cache keys are
    disjoint from bf16's (the salt carries icfg.int8_decode)."""
    out = _run_sandboxed("""
import os, sys
sys.path.insert(0, "tests")
import numpy as np
import jax
from cosy_tpu.utils import aot
aot.set_cache_dir(os.environ["AOT_DIR"])
from cosy_tpu.config import InferenceConfig
from cosy_tpu.infer.pipeline import TTSPipeline
from cosy_tpu.models import flow as F, llm as L
from cosy_tpu.models.hift import init_hift_params
from test_api import MODEL_CFG

key = jax.random.PRNGKey(0)
params = (L.init_llm_params(jax.random.fold_in(key, 1), MODEL_CFG.llm),
          F.init_flow_params(jax.random.fold_in(key, 2), MODEL_CFG.flow),
          init_hift_params(jax.random.fold_in(key, 3), MODEL_CFG.hift))

def make(int8):
    return TTSPipeline(MODEL_CFG, *params,
                       InferenceConfig(int8_decode=int8), finetuned_norm=True)

ids = np.asarray([[3, 5, 7]], np.int32)

pipe = make(True)
toks1 = pipe.generate_tokens(jax.random.PRNGKey(7), ids)
m0 = aot.AOT_STATS["misses"]
assert m0 > 0, aot.AOT_STATS

# rebuilt pipeline (server restart stand-in): hits, no new compiles
pipe2 = make(True)
toks2 = pipe2.generate_tokens(jax.random.PRNGKey(7), ids)
assert aot.AOT_STATS["hits"] > 0, aot.AOT_STATS
assert aot.AOT_STATS["misses"] == m0, ("int8 pipeline recompiled", aot.AOT_STATS)
np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))

# bf16 must NOT collide with the int8 entries: same signature, new compile
pipe3 = make(False)
pipe3.generate_tokens(jax.random.PRNGKey(7), ids)
assert aot.AOT_STATS["misses"] > m0, ("bf16 hit an int8 blob", aot.AOT_STATS)
print("INT8_AOT_OK")
""", str(tmp_path / "aot"))
    assert "INT8_AOT_OK" in out
