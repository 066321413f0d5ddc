"""ctypes bindings for the native SVM-light parser (svml_reader.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from gpc_tpu.native.build import load


def read(path):
    """Returns (X, y) or None if the native library is unavailable."""
    lib = load("svml_native")
    if lib is None:
        return None
    lib.svml_scan.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                              ctypes.POINTER(ctypes.c_long)]
    lib.svml_scan.restype = ctypes.c_int
    lib.svml_fill.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_double),
                              ctypes.POINTER(ctypes.c_double),
                              ctypes.c_long, ctypes.c_long]
    lib.svml_fill.restype = ctypes.c_long

    pathb = str(path).encode()
    n_rows = ctypes.c_long()
    max_idx = ctypes.c_long()
    if lib.svml_scan(pathb, ctypes.byref(n_rows), ctypes.byref(max_idx)) != 0:
        raise FileNotFoundError(path)
    N, D = n_rows.value, max_idx.value
    X = np.zeros((N, D), dtype=np.float64)
    y = np.zeros((N,), dtype=np.float64)
    got = lib.svml_fill(pathb, X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), N, D)
    if got != N:
        return None
    return X, y.reshape(N, 1)
