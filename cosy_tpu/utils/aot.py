"""Persistent AOT executable cache for serving programs.

Cold serving start compiles every program signature on first use — minutes
through a remote TPU runtime (serve.py --warmup exists exactly to front-load
that).  XLA's own persistent compilation cache does not survive across
processes through the axon tunnel (PERF.md), but
``jax.experimental.serialize_executable`` does: the compiled TPU executable
round-trips through bytes and ``deserialize_and_load`` is ~free (measured:
full serving warmup 389.7 s -> 135.7 s cross-process, 11/11 programs loaded,
zero recompiles — PERF.md "AOT executable cache").

``aot_jit(fn, static_argnames=..., name=..., salt=...)`` is a drop-in
``jax.jit``: with no cache directory configured it IS ``jax.jit`` (zero
overhead).  With ``COSY_TPU_AOT_CACHE=<dir>`` (or :func:`set_cache_dir`),
every compiled signature is serialized into the directory keyed by (program
name, salt, abstract arg signature, static argument values, jax version +
device fingerprint + cache schema version), and later processes load the
executable instead of compiling.

``salt`` is the caller's responsibility and the load-bearing safety knob: a
jitted closure bakes in configuration that is invisible to the abstract arg
signature (sampler/NFE choices, mel-norm flags, kernel-routing env vars) —
the pipelines pass a salt string covering everything their closures capture
(see ``TTSPipeline._aot_salt``), so a config flip produces a different key
instead of silently loading a stale program.  Code changes are covered
automatically: a hash of every ``.py`` source in the package is folded into
the fingerprint, so any edit to traced compute code invalidates all blobs
without anyone remembering to bump a schema.  Blobs deserialize via pickle,
so the cache dir is created 0700 and loading is refused from a directory
owned by someone else or group/world-writable.

A stale or incompatible blob falls back to compilation and is overwritten —
the cache can never break execution, only fail to speed it up.

The payoff target is TPU serving (device-side executables round-trip
cleanly).  The XLA:CPU backend logs machine-feature-mismatch warnings when
loading its AOT results even on the compiling machine (pseudo-features like
+prefer-no-scatter never match); results stay exact, but treat CPU runs as
test-only.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading
from typing import Optional

import jax
import numpy as np

__all__ = ["aot_jit", "set_cache_dir", "cache_dir", "AOT_STATS"]

# bump on on-disk *format* changes; compute-path code changes are covered
# automatically by the package source hash folded into _fingerprint()
_AOT_SCHEMA = "2"

_cache_dir: Optional[str] = None
_env_read = False
_fingerprint_cache: Optional[str] = None

# observability/testing: hits = executables loaded from disk, misses =
# compiles (first-ever or fallback), errors = stale-blob load failures
AOT_STATS = {"hits": 0, "misses": 0, "errors": 0}


def set_cache_dir(path: Optional[str]) -> None:
    global _cache_dir, _env_read
    _cache_dir = os.path.abspath(path) if path else None
    _env_read = True
    if _cache_dir:
        # 0700: blobs are unpickled at load — nobody else may plant them
        os.makedirs(_cache_dir, mode=0o700, exist_ok=True)


def _dir_is_trusted(path: str) -> bool:
    """Blobs deserialize via pickle, so loading from a directory another
    user can write into is arbitrary code execution at startup.  Only load
    when the dir is ours and not group/world-writable (POSIX; on platforms
    without st_uid semantics this degrades to allowing)."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    if hasattr(os, "getuid") and st.st_uid not in (os.getuid(), 0):
        return False
    return not (st.st_mode & 0o022)


def cache_dir() -> Optional[str]:
    global _env_read, _cache_dir
    if not _env_read:
        env = os.environ.get("COSY_TPU_AOT_CACHE")
        if env:
            set_cache_dir(env)
        else:
            _env_read = True
    return _cache_dir


def _source_hash() -> str:
    """sha256 over every .py source in the cosy_tpu package, so any code
    edit that could change traced-program semantics invalidates all blobs
    automatically — no hand-bumped schema to forget.  ~1 MB of reads, once
    per process."""
    import cosy_tpu

    root = os.path.dirname(os.path.abspath(cosy_tpu.__file__))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for fname in sorted(filenames):
            if fname.endswith(".py"):
                p = os.path.join(dirpath, fname)
                h.update(os.path.relpath(p, root).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()[:16]


def _fingerprint() -> str:
    global _fingerprint_cache
    if _fingerprint_cache is None:
        dev = jax.devices()[0]
        _fingerprint_cache = (f"{jax.__version__}|{dev.platform}|"
                              f"{getattr(dev, 'device_kind', '?')}|"
                              f"schema{_AOT_SCHEMA}|src{_source_hash()}")
    return _fingerprint_cache


def _leaf_sig(leaf):
    if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
        return (tuple(leaf.shape), np.dtype(leaf.dtype).str)
    return ("py", repr(leaf))


class _AotJit:
    """jax.jit plus executable persistence, per abstract signature."""

    def __init__(self, fn, static_argnames, name, salt=""):
        self._jitted = jax.jit(fn, static_argnames=static_argnames)
        self._static = tuple(static_argnames)
        self._name = name or getattr(fn, "__name__", "fn")
        self._salt = salt
        self._loaded: dict = {}  # hashable signature key -> compiled
        self._lock = threading.Lock()

    def _sig(self, args, dyn_kwargs, static_kwargs):
        """Hashable per-call signature — tuples of shapes/dtypes, no string
        building or hashing on the hot path (the sha256 filename is computed
        only on the load/compile slow path)."""
        leaves, treedef = jax.tree.flatten((args, dyn_kwargs))
        return (treedef, tuple(_leaf_sig(x) for x in leaves),
                tuple(sorted(static_kwargs.items())))

    def _path(self, sig) -> str:
        salt = self._salt() if callable(self._salt) else self._salt
        raw = "|".join([self._name, salt, _fingerprint(), repr(sig)])
        digest = hashlib.sha256(raw.encode()).hexdigest()[:32]
        return os.path.join(cache_dir(), f"{self._name}-{digest}.aot")

    def __call__(self, *args, **kwargs):
        static_kwargs = {k: v for k, v in kwargs.items() if k in self._static}
        dyn_kwargs = {k: v for k, v in kwargs.items() if k not in self._static}
        sig = self._sig(args, dyn_kwargs, static_kwargs)
        fn = self._loaded.get(sig)
        if fn is None:
            with self._lock:
                fn = self._loaded.get(sig)
                if fn is None:
                    fn = self._load_or_compile(sig, args, kwargs)
                    self._loaded[sig] = fn
        return fn(*args, **dyn_kwargs)

    def _load_or_compile(self, sig, args, kwargs):
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)

        path = self._path(sig)
        if os.path.exists(path) and _dir_is_trusted(cache_dir()):
            try:
                with open(path, "rb") as f:
                    blob, in_tree, out_tree, n_dev = pickle.load(f)
                # the executable was compiled for n_dev devices; the default
                # (all backend devices) mismatches on multi-device hosts
                compiled = deserialize_and_load(
                    blob, in_tree, out_tree,
                    execution_devices=jax.devices()[:n_dev])
                AOT_STATS["hits"] += 1
                return compiled
            except Exception:  # noqa: BLE001 — stale blob: recompile below
                AOT_STATS["errors"] += 1
        compiled = self._jitted.lower(*args, **kwargs).compile()
        AOT_STATS["misses"] += 1
        try:
            try:
                n_dev = len(compiled._executable.xla_executable.local_devices())
            except AttributeError:  # jax-internal layout drift
                n_dev = 1
            blob, in_tree, out_tree = serialize(compiled)
            fd, tmp = tempfile.mkstemp(dir=cache_dir(), suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump((blob, in_tree, out_tree, n_dev), f)
            os.replace(tmp, path)  # atomic: concurrent warmers can race
        except Exception:  # noqa: BLE001 — persistence is best-effort
            AOT_STATS["errors"] += 1
        return compiled


def aot_jit(fn, static_argnames=(), name: Optional[str] = None,
            salt=""):
    """Drop-in ``jax.jit(fn, static_argnames=...)`` with executable
    persistence when a cache directory is configured (COSY_TPU_AOT_CACHE or
    set_cache_dir); plain jax.jit otherwise.  ``salt`` (a string, or a
    zero-arg callable evaluated at compile/load time for values that can
    change after construction, e.g. set_voices adapter scales) must cover
    every configuration value the closure bakes into the traced program
    (see module docstring)."""
    if cache_dir() is None:
        return jax.jit(fn, static_argnames=static_argnames)
    return _AotJit(fn, static_argnames, name, salt)
