"""GP model tests (reference CGp.cpp; testGp.cpp pattern + sinc acceptance).

NLML closed forms are validated against direct dense numpy computations of the
marginal likelihood; gradients against finite differences; and the end-to-end
`gp learn` path against the canonical sinc hyperparameters (README.md:86-107).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.models import gp as gp_mod
from gpc_tpu.models.gp import GP, GpSpec, log_likelihood, make_objective, posterior

rng = np.random.default_rng(0)


def _toy(N=20, q=2, D=2):
    X = rng.standard_normal((N, q))
    y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))
    y = np.concatenate([y, np.cos(X[:, :1])], axis=1)[:, :D]
    return X, y


def _default_kern(q):
    return K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))


def _dense_nlml(Kmat, m):
    """Direct log N(m | 0, K) summed over columns."""
    N, D = m.shape
    sign, logdet = np.linalg.slogdet(Kmat)
    quad = np.trace(m.T @ np.linalg.solve(Kmat, m))
    return -0.5 * (quad + D * logdet) - 0.5 * N * D * np.log(2 * np.pi)


def test_ftc_log_likelihood_matches_dense():
    X, y = _toy()
    kern = _default_kern(2)
    model = GP(kern, X, y, centre=True)
    kp = model.kern_params()
    Kmat = np.asarray(kern.gram(jnp.asarray(kp), jnp.asarray(X)))
    m = (y - y.mean(0)) / 1.0
    want = _dense_nlml(Kmat, m)
    np.testing.assert_allclose(model.log_likelihood(), want, rtol=1e-9)


def test_ftc_learn_scales_term():
    X, y = _toy()
    kern = _default_kern(2)
    model = GP(kern, X, y, centre=True, learn_scales=True, scale_data=True)
    s = model.fixed_scales
    kp = model.kern_params()
    Kmat = np.asarray(kern.gram(jnp.asarray(kp), jnp.asarray(X)))
    m = (y - y.mean(0)) / s
    want = _dense_nlml(Kmat, m) - np.sum(np.log(np.abs(s)))
    np.testing.assert_allclose(model.log_likelihood(), want, rtol=1e-9)


@pytest.mark.parametrize("approx", ["dtc", "fitc"])
def test_sparse_log_likelihood_matches_dense_equivalent(approx):
    """DTC: N(m|0, Q + I/β); FITC: N(m|0, Q + diag(K−Q)+I/β) — compare the
    collapsed-evidence closed form (CGp.cpp:939-988) against the direct dense
    Gaussian with the same covariance."""
    X, y = _toy(N=25, q=2, D=1)
    kern = _default_kern(2)
    model = GP(kern, X, y, approx=approx, num_active=8, centre=True, beta=2.5, seed=3)
    kp = jnp.asarray(model.kern_params())
    X_u = model.inducing()
    beta = model.beta()
    Kuu = np.asarray(kern.gram(kp, jnp.asarray(X_u)))
    Kuf = np.asarray(kern.compute(kp, jnp.asarray(X_u), jnp.asarray(X)))
    Q = Kuf.T @ np.linalg.solve(Kuu, Kuf)
    if approx == "dtc":
        cov = Q + np.eye(25) / beta
    else:
        diagK = np.asarray(kern.diag(kp, jnp.asarray(X)))
        cov = Q + np.diag(diagK - np.diag(Q)) + np.eye(25) / beta
    m = y - y.mean(0)
    want = _dense_nlml(cov, m)
    got = model.log_likelihood()
    if approx == "fitc":
        # the reference FITC branch double-counts −0.5·N·D·log2π (CGp.cpp:966 adds
        # N·log2π inside L before the final −ND/2·log2π); replicate = want − ND/2·log2π
        want = want - 0.5 * 25 * 1 * np.log(2 * np.pi)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_dtcvar_trace_penalty():
    X, y = _toy(N=25, q=2, D=1)
    kern = _default_kern(2)
    m_dtc = GP(kern, X, y, approx="dtc", num_active=8, centre=True, beta=2.5, seed=3)
    m_var = GP(kern, X, y, approx="dtcvar", num_active=8, centre=True, beta=2.5, seed=3)
    kp = jnp.asarray(m_dtc.kern_params())
    X_u = m_dtc.inducing()
    beta = m_dtc.beta()
    Kuu = np.asarray(kern.gram(kp, jnp.asarray(X_u)))
    Kuf = np.asarray(kern.compute(kp, jnp.asarray(X_u), jnp.asarray(X)))
    diagK = np.asarray(kern.diag(kp, jnp.asarray(X)))
    trace_pen = beta * np.sum(diagK - np.diag(Kuf.T @ np.linalg.solve(Kuu, Kuf)))
    np.testing.assert_allclose(m_var.log_likelihood(),
                               m_dtc.log_likelihood() - 0.5 * trace_pen, rtol=1e-8)


@pytest.mark.parametrize("approx", ["ftc", "dtc", "dtcvar", "fitc"])
def test_gradients_vs_finite_differences(approx):
    X, y = _toy(N=15, q=2, D=2)
    kern = _default_kern(2)
    kwargs = dict(num_active=5, beta=3.0, seed=1) if approx != "ftc" else {}
    model = GP(kern, X, y, approx=approx, centre=True, learn_scales=True, **kwargs)
    obj = model._objective
    theta = np.asarray(model.theta)
    g = np.asarray(jax.grad(obj)(jnp.asarray(theta)))
    eps = 1e-6
    fd = np.zeros_like(theta)
    for i in range(len(theta)):
        tp = theta.copy(); tp[i] += eps
        tm = theta.copy(); tm[i] -= eps
        fd[i] = (float(obj(jnp.asarray(tp))) - float(obj(jnp.asarray(tm)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=2e-4, atol=1e-6)


def test_ftc_posterior_interpolates():
    X, y = _toy(N=20, q=2, D=1)
    kern = _default_kern(2)
    model = GP(kern, X, y, centre=True)
    mu, var = model.predict(X)
    # with white variance e-2 the posterior mean should be close to y
    assert np.max(np.abs(np.asarray(mu) - y)) < 0.5
    assert np.all(np.asarray(var) > 0)


def test_sparse_posterior_shapes_and_sanity():
    X, y = _toy(N=30, q=2, D=2)
    kern = _default_kern(2)
    model = GP(kern, X, y, approx="dtc", num_active=10, centre=True, seed=2)
    T = 7
    mu, var = model.predict(X[:T])
    assert mu.shape == (T, 2) and var.shape == (T, 2)
    assert np.all(np.asarray(var) > 0)


def test_sinc_acceptance():
    """`gp learn -# 100 examples/sinc.svml` canonical result (README.md:86-107):
    rbfinverseWidth≈0.199, rbfvariance≈0.0751, biasvariance≈1.68e-05,
    whitevariance≈2.04e-03, model bias≈0.107."""
    from gpc_tpu.io.svml import read_svml
    X, y = read_svml("/root/reference/examples/sinc.svml")
    assert X.shape == (40, 1)
    kern = _default_kern(1)
    model = GP(kern, X, y, centre=True)
    res = model.optimise(iters=100)
    kp = model.kern_params()
    got = dict(zip(["rbfinverseWidth", "rbfvariance", "biasvariance", "whitevariance"], kp))
    assert abs(model.bias[0] - 0.107) < 2e-3
    # optimizer-tolerance parity with the reference's learned hyperparameters
    assert abs(got["rbfinverseWidth"] - 0.199) / 0.199 < 0.05, got
    assert abs(got["rbfvariance"] - 0.0751) / 0.0751 < 0.10, got
    assert got["biasvariance"] < 1e-3, got
    assert abs(got["whitevariance"] - 2.04e-3) / 2.04e-3 < 0.15, got


def test_optimise_verbose_runs_checkgrad(capsys):
    # verbosity>2 with <40 params auto-runs the finite-difference gradient
    # check before optimizing (CGp::optimise, CGp.cpp:1544-1545)
    X, y = _toy(N=12, q=1, D=1)
    model = GP(_default_kern(1), X, y, centre=True)
    model.optimise(iters=2, verbose=3)
    out = capsys.readouterr().out
    assert "Largest difference" in out
