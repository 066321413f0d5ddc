"""Optimizers: SCG (default), CG, GD, L-BFGS (native), checkgrad.

Dispatch mirrors the reference optimiser-name strings
`scg|conjgrad|graddesc|quasinew` (COptimisable.h:153-182).
"""

from typing import NamedTuple

import jax.numpy as jnp

from gpc_tpu.optim.scg import (scg, scg_checkpointed, scg_minimize,  # noqa: F401
                               ScgResult)
from gpc_tpu.optim.cg import cg, CgResult  # noqa: F401
from gpc_tpu.optim.gd import gd, gd_pullback, GdResult  # noqa: F401
from gpc_tpu.optim.lbfgs import lbfgs, LbfgsResult  # noqa: F401
from gpc_tpu.optim.checkgrad import check_gradients  # noqa: F401


class OptResult(NamedTuple):
    x: object
    obj: object
    iters: object


def run_optimiser(name: str, value_and_grad_fn, x0, max_iters: int,
                  param_tol: float = 1e-6, obj_tol: float = 1e-6,
                  ckpt_path: str = None, ckpt_every: int = 50,
                  resume: bool = False) -> OptResult:
    """Run the named optimizer; returns a uniform (x, obj, iters) result.

    `ckpt_path` enables mid-run preemption checkpoints (SCG only): the full
    optimizer state is written atomically every `ckpt_every` iterations via
    utils/checkpoint, and `resume=True` continues a killed run from the file
    on the bit-identical trajectory (scg_checkpointed)."""
    if name == "scg" and ckpt_path:
        import os

        from gpc_tpu.utils import checkpoint as ckpt

        resume_state = None
        if resume and os.path.exists(ckpt_path):
            _step, theta, extra, _key = ckpt.load(ckpt_path)
            resume_state = dict(extra, w=theta)

        def on_checkpoint(step, state):
            st = dict(state)
            ckpt.save(ckpt_path, step, st.pop("w"), extra=st)

        r = scg_checkpointed(value_and_grad_fn, x0, max_iters=max_iters,
                             param_tol=param_tol, obj_tol=obj_tol,
                             ckpt_every=ckpt_every,
                             on_checkpoint=on_checkpoint,
                             resume_state=resume_state)
        return OptResult(r.x, r.obj, r.iters)
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
