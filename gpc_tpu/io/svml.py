"""SVM-light data file reader/writer.

Counterpart of the reference CLI's two-pass parser (CClctrl.cpp:55-171):
`label idx:val idx:val ...` per line, 1-based feature indices, `#` starts a
comment, CR tolerated.  Feature count = max index seen; absent features are 0.

A native C++ fast path (gpc_tpu/native/svml_reader.cpp) is used when available
for large files; this module is the always-available reference implementation
and the fallback.
"""

from __future__ import annotations

import numpy as np


def read_svml(path):
    """Returns (X, y): X (N, maxdim) float64, y (N, 1) float64."""
    try:
        from gpc_tpu.native import svml_native
        out = svml_native.read(path)
        if out is not None:
            return out
    except Exception:
        pass
    return read_svml_py(path)


def read_svml_py(path):
    labels = []
    rows = []
    max_idx = 0
    with open(path, "r") as f:
        for line in f:
            line = line.split("#", 1)[0].strip().rstrip("\r")
            if not line:
                continue
            toks = line.split()
            labels.append(float(toks[0]))
            feats = []
            for t in toks[1:]:
                i, v = t.split(":")
                i = int(i)
                max_idx = max(max_idx, i)
                feats.append((i, float(v)))
            rows.append(feats)
    N = len(labels)
    X = np.zeros((N, max_idx), dtype=np.float64)
    for r, feats in enumerate(rows):
        for i, v in feats:
            X[r, i - 1] = v
    y = np.asarray(labels, dtype=np.float64).reshape(N, 1)
    return X, y


def write_svml(path, X, y):
    X = np.asarray(X)
    y = np.asarray(y).reshape(-1)
    with open(path, "w") as f:
        for r in range(X.shape[0]):
            feats = " ".join(f"{j + 1}:{X[r, j]:.17g}" for j in range(X.shape[1]) if X[r, j] != 0.0)
            f.write(f"{y[r]:.17g} {feats}\n".rstrip() + "\n")
