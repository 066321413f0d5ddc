"""Finite-difference gradient verification.

Counterpart of COptimisable::checkGradients (reference COptimisable.cpp:9-44):
central differences at GRADCHANGE=1e-6, printed analytic-vs-numerical table.
Kept as a diagnostic even though gradients come from jax.grad — it validates
the whole objective construction, not just the differentiation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gpc_tpu.ndlutil import GRADCHANGE


def check_gradients(value_and_grad_fn, x, step: float = GRADCHANGE,
                    verbose: bool = True):
    """Returns (analytic, numerical, max_abs_diff)."""
    x = np.asarray(x, dtype=np.float64)
    _, g = value_and_grad_fn(jnp.asarray(x))
    g = np.asarray(g)
    num = np.zeros_like(x)
    for i in range(x.size):
        xp, xm = x.copy(), x.copy()
        xp[i] += step
        xm[i] -= step
        fp, _ = value_and_grad_fn(jnp.asarray(xp))
        fm, _ = value_and_grad_fn(jnp.asarray(xm))
        num[i] = (float(fp) - float(fm)) / (2.0 * step)
    diff = float(np.max(np.abs(g - num)))
    if verbose:
        print("Numerical differences:")
        print(num)
        print("Analytic gradients:")
        print(g)
        print(f"Largest difference: {diff}")
    return g, num, diff
