"""SCG optimizer tests (reference COptimisable.cpp:246-396 behavior)."""

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu.optim.scg import scg_minimize


def test_quadratic_converges():
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]))
    b = jnp.asarray([1.0, -2.0, 3.0])

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    res = scg_minimize(f, jnp.zeros(3), max_iters=200)
    want = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-4, atol=1e-5)
    assert bool(res.converged)


def test_rosenbrock_2d():
    def f(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = scg_minimize(f, jnp.asarray([-1.2, 1.0]), max_iters=1000)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=2e-3)


def test_nan_objective_is_rejected_not_fatal():
    # objective NaN outside a basin: the optimizer must treat the step as failed
    # (reference CG pulls back on non-PD exceptions, COptimisable.cpp:481-523)
    def f(x):
        v = jnp.sum(x * x)
        return jnp.where(v < 100.0, v + jnp.log(4.0 - x[0]), jnp.nan)

    res = scg_minimize(f, jnp.asarray([3.0, 1.0]), max_iters=300)
    assert np.isfinite(float(res.obj))
    assert float(res.obj) <= float(f(jnp.asarray([3.0, 1.0])))


def test_runs_under_jit_with_fixed_iter_budget():
    def f(x):
        return jnp.sum((x - 1.5) ** 2)

    res = jax.jit(lambda x0: scg_minimize(f, x0, max_iters=50, jit=False))(jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(res.x), 1.5 * np.ones(4), rtol=1e-5)
