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


def test_lbfgs_more_thuente_wolfe_trajectory():
    """Trajectory-quality pin for the Moré-Thuente search (the reference's
    MCSRCH, ndlfortran.f:623-925): every accepted L-BFGS step satisfies the
    strong Wolfe conditions with the reference constants FTOL=1e-4, GTOL=0.9
    (ndlfortran.f:284, :245-247), and Rosenbrock converges to the optimum.
    (Float-exact trajectory parity vs the Fortran is unverifiable here: the
    reference's own f2c bundle omits LBFGS — ndlfortran.c has no mcsrch — and
    tools/build_oracle.sh stubs lbfgs_.)"""
    import ctypes
    from gpc_tpu.optim.lbfgs import _native_lib

    lib = _native_lib()
    if lib is None:
        import pytest
        pytest.skip("native toolchain unavailable")

    def vag(v):
        x, y = v
        f = 100.0 * (y - x * x) ** 2 + (1.0 - x) ** 2
        g = np.array([-400.0 * x * (y - x * x) - 2.0 * (1.0 - x),
                      200.0 * (y - x * x)])
        return f, g

    x = np.array([-1.2, 1.0])
    h = lib.lbfgs_create(2, 10)
    lib.lbfgs_set_tols(h, 1e-8, 1e-10, 20)
    try:
        # manual reverse-communication drive, recording (x0, f0, g0, x1, f1, g1)
        # around each iteration boundary to check strong Wolfe on accepted steps
        task = 0
        prev_iter = 0
        x0, f0, g0 = None, None, None
        wolfe_checked = 0
        for _ in range(2000):
            f, g = vag(x)
            xin = x.copy()
            task = lib.lbfgs_step(
                h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                ctypes.c_double(float(f)),
                g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            it = lib.lbfgs_iterations(h)
            if it > prev_iter and x0 is not None:
                # the point just fed in was ACCEPTED: strong Wolfe vs origin
                d = xin - x0
                dg0 = g0 @ d
                assert f <= f0 + 1e-4 * dg0 + 1e-12, "sufficient decrease"
                assert abs(g @ d) <= 0.9 * abs(dg0) + 1e-12, "curvature"
                wolfe_checked += 1
            if it > prev_iter or x0 is None:
                x0, f0, g0 = xin, float(f), g.copy()
                prev_iter = it
            if task != 0:
                break
        assert task == 1, f"did not converge (task={task})"
        assert wolfe_checked >= 5
        np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-5)
    finally:
        lib.lbfgs_destroy(h)


def test_lbfgs_quadratic_fast_convergence():
    """On an n-D convex quadratic, L-BFGS with an exact-ish Moré-Thuente
    search terminates in a small multiple of n iterations."""
    rng = np.random.default_rng(0)
    n = 8
    A = rng.standard_normal((n, n))
    H = A @ A.T + np.eye(n)
    b = rng.standard_normal(n)

    def vag(v):
        v = np.asarray(v)
        return 0.5 * float(v @ H @ v) - float(b @ v), H @ v - b

    res = lbfgs(vag, np.zeros(n), max_iters=200, grad_tol=1e-7)
    assert res.converged
    assert res.iters <= 40
    np.testing.assert_allclose(res.x, np.linalg.solve(H, b), atol=1e-6)
