"""Native (C++) host kernels with pure-numpy fallbacks.

``build()`` compiles the extensions in-place with the system toolchain; the
Python wrappers transparently fall back to numpy when the extension is not
built.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))


def _ext_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_DIR, "_mas" + suffix)


def build(verbose: bool = False) -> bool:
    """Compile the _mas extension in place.  Returns True on success."""
    out = _ext_path()
    src = os.path.join(_DIR, "mas.cpp")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
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


def _load():
    try:
        from . import _mas  # type: ignore

        return _mas
    except ImportError:
        if build():
            import importlib

            try:
                return importlib.import_module("cosy_tpu.native._mas")
            except ImportError:
                return None
        return None


_mas_mod = None
_tried = False


def mas_module():
    global _mas_mod, _tried
    if not _tried:
        _mas_mod = _load()
        _tried = True
    return _mas_mod
