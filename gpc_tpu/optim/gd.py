"""Gradient descent with momentum, and adaptive-rate backtracking variant.

Counterparts of COptimisable::gdOptimise (reference COptimisable.cpp:46-104:
momentum update changeParams ← momentum·changeParams − learnRate·grad) and
gdPullbackOptimise (COptimisable.cpp:105-169: halve the rate on objective
increase, grow ×1.1 on success).  The momentum variant is a jitted
lax.while_loop; the pullback variant host-drives a jitted evaluation.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


class GdResult(NamedTuple):
    x: jax.Array
    obj: jax.Array
    iters: jax.Array


def gd(value_and_grad_fn: Callable, x0, max_iters: int = 1000,
       learn_rate: float = 1e-4, momentum: float = 0.9,
       param_tol: float = 1e-6, obj_tol: float = 1e-6) -> GdResult:
    x0 = jnp.asarray(x0)

    def body(state):
        x, change, old_obj, it, _conv = state
        obj, g = value_and_grad_fn(x)
        if momentum > 0:
            change = momentum * (change - (learn_rate / momentum) * g)
            x_new = x + change
        else:
            change = -learn_rate * g
            x_new = x + change
        diff_param = jnp.max(jnp.abs(x_new - x))
        diff_obj = jnp.abs(obj - old_obj)
        conv = jnp.logical_and(diff_obj < obj_tol, diff_param < param_tol)
        return x_new, change, obj, it + 1, conv

    def cond(state):
        _x, _c, _o, it, conv = state
        return jnp.logical_and(it < max_iters, ~conv)

    obj0, _ = value_and_grad_fn(x0)
    init = (x0, jnp.zeros_like(x0), obj0, jnp.array(0), jnp.array(False))
    x, _, obj, it, _ = lax.while_loop(cond, body, init)
    return GdResult(x=x, obj=obj, iters=it)


def gd_pullback(value_and_grad_fn: Callable, x0, max_iters: int = 1000,
                learn_rate: float = 1e-4, param_tol: float = 1e-6,
                obj_tol: float = 1e-6) -> GdResult:
    x = np.asarray(x0, dtype=np.float64).copy()

    def vag(v):
        f, g = value_and_grad_fn(jnp.asarray(v))
        return float(f), np.asarray(g)

    obj, _ = vag(x)
    it = 0
    for it in range(1, max_iters + 1):
        while True:
            old = x.copy()
            _, g = vag(x)
            x_try = x - learn_rate * g
            new_obj, _ = vag(x_try)
            if obj - new_obj < 0 or not np.isfinite(new_obj):
                learn_rate /= 2.0
            else:
                diff_obj = obj - new_obj
                x, obj = x_try, new_obj
                learn_rate *= 1.1
                break
        diff_param = np.max(np.abs(x - old))
        if diff_obj < obj_tol and diff_param < param_tol:
            break
    return GdResult(x=jnp.asarray(x), obj=jnp.asarray(obj), iters=jnp.asarray(it))
