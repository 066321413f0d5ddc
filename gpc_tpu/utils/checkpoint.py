"""Training checkpoints: (parameter vector, optimizer state, PRNG key).

The reference's checkpoints ARE its text model files (`gp relearn` warm-starts
from them, gp.cpp:439-534) — those still work here via gpc_tpu.io.model_io.
This module adds the systems-level piece the reference lacks (SURVEY.md §5):
periodic binary checkpoints for preemption recovery, written atomically
(tmp + rename) so a killed run never leaves a torn file.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import jax


def save(path: str, step: int, theta, extra: dict | None = None,
         prng_key=None):
    """Atomically write a checkpoint."""
    payload = {"step": np.asarray(step), "theta": np.asarray(theta)}
    if prng_key is not None:
        payload["prng_key"] = np.asarray(jax.random.key_data(prng_key))
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str):
    """Returns (step, theta, extra, prng_key or None)."""
    with np.load(path, allow_pickle=False) as z:
        step = int(z["step"])
        theta = z["theta"]
        prng_key = None
        if "prng_key" in z:
            prng_key = jax.random.wrap_key_data(z["prng_key"])
        extra = {k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")}
    return step, theta, extra, prng_key
