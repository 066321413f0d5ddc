"""L-BFGS driver: native C++ engine with reverse communication.

Counterpart of COptimisable::lbfgsOptimise (reference COptimisable.cpp:185-245),
which drives the Fortran LBFGS the same way: the native library owns the
curvature history and step logic; every objective/gradient evaluation is a
jitted device computation fed back through the ctypes boundary.  m=10 history
pairs like the reference.  Falls back to a pure-Python two-loop implementation
if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
from typing import Callable, NamedTuple

import numpy as np
import jax.numpy as jnp


class LbfgsResult(NamedTuple):
    x: np.ndarray
    obj: float
    iters: int
    converged: bool


def _native_lib():
    from gpc_tpu.native.build import load
    lib = load("lbfgs_native")
    if lib is None:
        return None
    lib.lbfgs_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.lbfgs_create.restype = ctypes.c_void_p
    lib.lbfgs_destroy.argtypes = [ctypes.c_void_p]
    lib.lbfgs_set_tols.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                   ctypes.c_double, ctypes.c_int]
    lib.lbfgs_step.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_double),
                               ctypes.c_double,
                               ctypes.POINTER(ctypes.c_double)]
    lib.lbfgs_step.restype = ctypes.c_int
    lib.lbfgs_iterations.argtypes = [ctypes.c_void_p]
    lib.lbfgs_iterations.restype = ctypes.c_long
    return lib


def lbfgs(value_and_grad_fn: Callable, x0, max_iters: int = 1000, m: int = 10,
          grad_tol: float = 1e-6) -> LbfgsResult:
    x = np.asarray(x0, dtype=np.float64).copy()
    n = x.size

    def vag(v):
        f, g = value_and_grad_fn(jnp.asarray(v))
        return float(f), np.asarray(g, dtype=np.float64)

    lib = _native_lib()
    if lib is not None:
        h = lib.lbfgs_create(n, m)
        lib.lbfgs_set_tols(h, grad_tol, 1e-12, 25)
        try:
            task = 0
            evals = 0
            f = np.inf
            fbest, xbest = np.inf, x.copy()
            max_evals = max_iters * 30
            while task == 0 and evals < max_evals:
                f, g = vag(x)
                # pass non-finite f straight through — the native engine's
                # Moré-Thuente loop retreats toward the best endpoint itself
                # (lbfgs.cpp NaN branch); substituting a huge finite value
                # here would poison its interpolation state instead.  The
                # one case it can't see is finite f with non-finite g:
                if np.isfinite(f) and not np.all(np.isfinite(g)):
                    f = np.float64(np.inf)
                if np.isfinite(f) and f < fbest:
                    fbest, xbest = f, x.copy()
                task = lib.lbfgs_step(
                    h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    ctypes.c_double(f),
                    g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
                evals += 1
                if lib.lbfgs_iterations(h) >= max_iters:
                    break
            iters = int(lib.lbfgs_iterations(h))
        finally:
            lib.lbfgs_destroy(h)
        if task == 1:
            # converged: the engine returns before proposing a new trial,
            # so x is exactly the point the loop just evaluated and f its
            # objective — no re-evaluation needed
            return LbfgsResult(x=x, obj=float(f), iters=iters,
                               converged=True)
        # iteration/eval cap or line-search failure: x may hold a freshly
        # proposed UNevaluated trial step — return the best point the
        # optimizer actually evaluated, not the dangling proposal
        return LbfgsResult(x=xbest, obj=float(fbest), iters=iters,
                           converged=False)

    return _python_lbfgs(vag, x, max_iters, m, grad_tol)


def _python_lbfgs(vag, x, max_iters, m, grad_tol):
    """Fallback: two-loop recursion + Armijo backtracking."""
    s_hist, y_hist, rho = [], [], []
    f, g = vag(x)
    iters = 0
    converged = False
    for iters in range(1, max_iters + 1):
        if np.max(np.abs(g)) < grad_tol:
            converged = True
            break
        q = g.copy()
        alpha = []
        for s, y_, r in zip(reversed(s_hist), reversed(y_hist), reversed(rho)):
            a = r * s @ q
            alpha.append(a)
            q -= a * y_
        if y_hist:
            q *= (s_hist[-1] @ y_hist[-1]) / (y_hist[-1] @ y_hist[-1])
        for (s, y_, r), a in zip(zip(s_hist, y_hist, rho), reversed(alpha)):
            q += (a - r * y_ @ q) * s
        d = -q
        dg = d @ g
        if dg >= 0:
            d, dg = -g, -(g @ g)
        step = 1.0 if y_hist else min(1.0, 1.0 / np.max(np.abs(g)))
        ok = False
        for _ in range(30):
            f_new, g_new = vag(x + step * d)
            if np.isfinite(f_new) and f_new <= f + 1e-4 * step * dg:
                ok = True
                break
            step *= 0.5
        if not ok:
            break
        s, y_ = step * d, g_new - g
        sy = s @ y_
        if sy > 1e-10 * (y_ @ y_):
            s_hist.append(s)
            y_hist.append(y_)
            rho.append(1.0 / sy)
            if len(s_hist) > m:
                s_hist.pop(0)
                y_hist.pop(0)
                rho.pop(0)
        x = x + step * d
        f, g = f_new, g_new
    return LbfgsResult(x=x, obj=f, iters=iters, converged=converged)
