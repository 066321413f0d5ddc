"""Tests for CG / GD / L-BFGS / checkgrad (reference COptimisable.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu.optim.cg import cg
from gpc_tpu.optim.gd import gd, gd_pullback
from gpc_tpu.optim.lbfgs import lbfgs, _python_lbfgs
from gpc_tpu.optim.checkgrad import check_gradients


def _quad():
    A = jnp.asarray(np.diag([1.0, 5.0, 25.0]))
    b = jnp.asarray([1.0, -2.0, 3.0])
    xstar = np.linalg.solve(np.asarray(A), np.asarray(b))

    def f(x):
        return 0.5 * x @ A @ x - b @ x
    return jax.value_and_grad(f), xstar


def _rosen_vag():
    def f(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2
    return jax.value_and_grad(f)


def test_cg_quadratic():
    vag, xstar = _quad()
    res = cg(jax.jit(vag), np.zeros(3), max_iters=100)
    np.testing.assert_allclose(res.x, xstar, rtol=1e-6, atol=1e-8)


def test_cg_rosenbrock():
    res = cg(jax.jit(_rosen_vag()), np.array([-1.2, 1.0]), max_iters=300)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-4)


def test_gd_momentum_quadratic():
    vag, xstar = _quad()
    res = gd(jax.jit(vag), jnp.zeros(3), max_iters=3000, learn_rate=1e-2,
             momentum=0.9)
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-3, atol=1e-4)


def test_gd_pullback_adapts_rate():
    vag, xstar = _quad()
    res = gd_pullback(jax.jit(vag), np.zeros(3), max_iters=500, learn_rate=1.0)
    np.testing.assert_allclose(np.asarray(res.x), xstar, rtol=1e-3, atol=1e-4)


def test_lbfgs_native_quadratic():
    vag, xstar = _quad()
    res = lbfgs(jax.jit(vag), np.zeros(3), max_iters=100)
    np.testing.assert_allclose(res.x, xstar, rtol=1e-6, atol=1e-8)
    assert res.converged


def test_lbfgs_native_rosenbrock():
    res = lbfgs(jax.jit(_rosen_vag()), np.array([-1.2, 1.0]), max_iters=500)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-5)


def test_lbfgs_python_fallback():
    vag, xstar = _quad()
    jv = jax.jit(vag)

    def v(x):
        f, g = jv(x)
        return float(f), np.asarray(g)
    res = _python_lbfgs(v, np.zeros(3), 200, 10, 1e-8)
    np.testing.assert_allclose(res.x, xstar, rtol=1e-5, atol=1e-7)


def test_checkgrad():
    vag, _ = _quad()
    g, num, diff = check_gradients(jax.jit(vag), np.array([0.3, -0.7, 1.1]),
                                   verbose=False)
    assert diff < 1e-5
    np.testing.assert_allclose(g, num, rtol=1e-4, atol=1e-6)
