"""Optimizers: SCG (default), CG, GD, L-BFGS (native), checkgrad.

Dispatch mirrors the reference optimiser-name strings
`scg|conjgrad|graddesc|quasinew` (COptimisable.h:153-182).
"""

from typing import NamedTuple

import jax.numpy as jnp

from gpc_tpu.optim.scg import scg, scg_minimize, ScgResult  # noqa: F401
from gpc_tpu.optim.cg import cg, CgResult  # noqa: F401
from gpc_tpu.optim.gd import gd, gd_pullback, GdResult  # noqa: F401
from gpc_tpu.optim.lbfgs import lbfgs, LbfgsResult  # noqa: F401
from gpc_tpu.optim.checkgrad import check_gradients  # noqa: F401


class OptResult(NamedTuple):
    x: object
    obj: object
    iters: object


def run_optimiser(name: str, value_and_grad_fn, x0, max_iters: int,
                  param_tol: float = 1e-6, obj_tol: float = 1e-6) -> OptResult:
    """Run the named optimizer; returns a uniform (x, obj, iters) result."""
    if name == "scg":
        r = scg(value_and_grad_fn, x0, max_iters=max_iters,
                param_tol=param_tol, obj_tol=obj_tol)
        return OptResult(r.x, r.obj, r.iters)
    if name == "conjgrad":
        r = cg(value_and_grad_fn, x0, max_iters=max_iters)
        return OptResult(jnp.asarray(r.x), r.obj, r.iters)
    if name == "graddesc":
        r = gd(value_and_grad_fn, jnp.asarray(x0), max_iters=max_iters,
               param_tol=param_tol, obj_tol=obj_tol)
        return OptResult(r.x, r.obj, r.iters)
    if name == "quasinew":
        r = lbfgs(value_and_grad_fn, x0, max_iters=max_iters)
        return OptResult(jnp.asarray(r.x), r.obj, r.iters)
    raise ValueError(f"Unrecognised optimiser type: {name}")
