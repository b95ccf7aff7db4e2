"""Persistent AOT executable cache for serving programs.

Cold serving start compiles every program signature on first use — minutes
through a remote TPU runtime (serve.py --warmup exists exactly to front-load
that).  XLA's own persistent compilation cache does not survive across
processes through the axon tunnel (PERF.md), but
``jax.experimental.serialize_executable`` does: the compiled TPU executable
round-trips through bytes and ``deserialize_and_load`` is ~free (measured:
0.7 s compile vs 0.00 s load for a 17-matmul scan program; the win scales
with program size — real serving programs compile for minutes).

``aot_jit(fn, static_argnames=..., name=...)`` is a drop-in ``jax.jit``:
with no cache directory configured it IS ``jax.jit`` (zero overhead).  With
``COSY_TPU_AOT_CACHE=<dir>`` (or :func:`set_cache_dir`), every compiled
signature is serialized into the directory keyed by (program name, abstract
arg signature, static argument values, jax version + device fingerprint),
and later processes load the executable instead of compiling.

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

_lock = threading.Lock()
_cache_dir: Optional[str] = None
_env_read = False

# observability/testing: hits = executables loaded from disk, misses =
# compiles (first-ever or fallback), errors = stale-blob load failures
AOT_STATS = {"hits": 0, "misses": 0, "errors": 0}


def set_cache_dir(path: Optional[str]) -> None:
    global _cache_dir, _env_read
    _cache_dir = os.path.abspath(path) if path else None
    _env_read = True
    if _cache_dir:
        os.makedirs(_cache_dir, exist_ok=True)


def cache_dir() -> Optional[str]:
    global _env_read, _cache_dir
    if not _env_read:
        env = os.environ.get("COSY_TPU_AOT_CACHE")
        if env:
            set_cache_dir(env)
        else:
            _env_read = True
    return _cache_dir


def _fingerprint() -> str:
    dev = jax.devices()[0]
    return f"{jax.__version__}|{dev.platform}|{getattr(dev, 'device_kind', '?')}"


def _sig_of(tree) -> str:
    leaves, treedef = jax.tree.flatten(tree)
    parts = [str(treedef)]
    for leaf in leaves:
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            parts.append(f"{tuple(leaf.shape)}:{np.dtype(leaf.dtype).str}")
        else:
            parts.append(f"py:{leaf!r}")
    return ";".join(parts)


class _AotJit:
    """jax.jit plus executable persistence, per abstract signature."""

    def __init__(self, fn, static_argnames, name):
        self._jitted = jax.jit(fn, static_argnames=static_argnames)
        self._static = tuple(static_argnames)
        self._name = name or getattr(fn, "__name__", "fn")
        self._loaded: dict = {}
        self._lock = threading.Lock()

    def _key(self, args, dyn_kwargs, static_kwargs) -> str:
        raw = "|".join([
            self._name, _fingerprint(), _sig_of((args, dyn_kwargs)),
            repr(sorted(static_kwargs.items())),
        ])
        return hashlib.sha256(raw.encode()).hexdigest()[:32]

    def __call__(self, *args, **kwargs):
        static_kwargs = {k: v for k, v in kwargs.items() if k in self._static}
        dyn_kwargs = {k: v for k, v in kwargs.items() if k not in self._static}
        key = self._key(args, dyn_kwargs, static_kwargs)
        fn = self._loaded.get(key)
        if fn is None:
            with self._lock:
                fn = self._loaded.get(key)
                if fn is None:
                    fn = self._load_or_compile(key, args, kwargs)
                    self._loaded[key] = fn
        return fn(*args, **dyn_kwargs)

    def _load_or_compile(self, key, args, kwargs):
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)

        path = os.path.join(cache_dir(), f"{self._name}-{key}.aot")
        if os.path.exists(path):
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


def aot_jit(fn, static_argnames=(), name: Optional[str] = None):
    """Drop-in ``jax.jit(fn, static_argnames=...)`` with executable
    persistence when a cache directory is configured (COSY_TPU_AOT_CACHE or
    set_cache_dir); plain jax.jit otherwise."""
    if cache_dir() is None:
        return jax.jit(fn, static_argnames=static_argnames)
    return _AotJit(fn, static_argnames, name)
