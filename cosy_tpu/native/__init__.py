"""Native (C++) host kernels with pure-numpy fallbacks.

Two kernels live here, mirroring where the reference leans on native code
for host-side work:

- ``mas.cpp`` — Monotonic Alignment Search DP (reference: the Cython
  matcha/utils/monotonic_align/core.pyx, its only native source);
- ``f0.cpp`` — autocorrelation pitch tracker (reference: pyworld, a C++
  library, via cosyvoice/dataset/processor.py compute_f0).

``build()`` compiles the extensions in-place with the system toolchain; the
Python wrappers transparently fall back to numpy when an extension is not
built.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Dict, Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
EXTENSIONS = ("mas", "f0")

# per-extension extra compile flags: f0's hot loop is a dot-product reduction
# that only vectorizes under fp reassociation (the tracker is tolerance-level
# numerics — tests/test_f0.py gates against physical ground truth)
_EXTRA_FLAGS = {"f0": ["-march=native", "-ffast-math"]}


def _ext_path(name: str) -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_DIR, f"_{name}" + suffix)


def build_one(name: str, verbose: bool = False) -> bool:
    """Compile one extension in place.  Returns True on success."""
    out = _ext_path(name)
    src = os.path.join(_DIR, f"{name}.cpp")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
        *_EXTRA_FLAGS.get(name, []),
        f"-I{include}", src, "-o", out,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if verbose or res.returncode != 0:
            sys.stderr.write(res.stdout + res.stderr)
        return res.returncode == 0
    except Exception as e:  # noqa: BLE001
        if verbose:
            sys.stderr.write(f"native build failed: {e}\n")
        return False


def build(verbose: bool = False) -> bool:
    """Compile all extensions; True only if every one built."""
    return all(build_one(name, verbose) for name in EXTENSIONS)


_modules: Dict[str, Optional[object]] = {}


def module(name: str):
    """Cached import of extension ``name``, building on demand; None if the
    toolchain is unavailable."""
    if name not in _modules:
        mod = None
        try:
            import importlib

            mod = importlib.import_module(f"cosy_tpu.native._{name}")
        except ImportError:
            if build_one(name):
                import importlib

                try:
                    mod = importlib.import_module(f"cosy_tpu.native._{name}")
                except ImportError:
                    mod = None
        _modules[name] = mod
    return _modules[name]


def mas_module():
    return module("mas")


def f0_module():
    return module("f0")
