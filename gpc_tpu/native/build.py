"""Lazy on-demand build of the native C++ helpers.

Compiles gpc_tpu/native/*.cpp into shared libraries next to the sources the
first time they're requested; rebuilds when the source is newer than the .so.
The rest of the framework treats native availability as an optimization —
every native component has a pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE = {}

_SOURCES = {
    "svml_native": "svml_reader.cpp",
    "lbfgs_native": "lbfgs.cpp",
}


def _build(name: str) -> str:
    src = os.path.join(_DIR, _SOURCES[name])
    so = os.path.join(_DIR, f"lib{name}.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so]
        subprocess.run(cmd, check=True, capture_output=True)
    return so


def load(name: str):
    """Returns the ctypes CDLL for a native helper, or None if unavailable."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        try:
            lib = ctypes.CDLL(_build(name))
        except Exception:
            lib = None
        _CACHE[name] = lib
        return lib
