"""Mapping model tests (reference CMltools.cpp, testMltools.cpp pattern)."""

import numpy as np
import jax.numpy as jnp

from gpc_tpu.models.mltools import LinearMapping, MlpMapping

rng = np.random.default_rng(9)


def test_linear_mapping_recovers_linear_fn():
    X = rng.standard_normal((60, 3))
    Wtrue = np.array([[1.0, -2.0], [0.5, 0.0], [0.0, 3.0]])
    y = X @ Wtrue + np.array([0.3, -0.7]) + 0.01 * rng.standard_normal((60, 2))
    m = LinearMapping(X, y, seed=1)
    m.optimise(iters=300)
    W, b = m.unpack(m.theta)
    np.testing.assert_allclose(np.asarray(W), Wtrue, atol=0.02)
    np.testing.assert_allclose(np.asarray(b)[0], [0.3, -0.7], atol=0.02)
    pred = np.asarray(m.out(X))
    assert np.mean((pred - y) ** 2) < 1e-3


def test_linear_loglik_form():
    X = rng.standard_normal((10, 2))
    y = rng.standard_normal((10, 1))
    m = LinearMapping(X, y, seed=2)
    W, b = m.unpack(m.theta)
    resid = X @ np.asarray(W) + np.asarray(b) - y
    # L = −0.5[Σ‖r‖²/σ² + N(log2π + log σ²)] (CMltools.cpp:229-246, N not N·D)
    want = -0.5 * ((resid ** 2).sum() + 10 * np.log(2 * np.pi))
    np.testing.assert_allclose(m.log_likelihood(), want, rtol=1e-10)


def test_mlp_mapping_fits_nonlinear_fn():
    X = rng.uniform(-2, 2, (80, 1))
    y = np.sin(2 * X) + 0.01 * rng.standard_normal((80, 1))
    m = MlpMapping(X, y, hidden_dim=10, seed=3)
    m.optimise(iters=500)
    pred = np.asarray(m.out(X))
    assert np.mean((pred - y) ** 2) < 0.02


def test_mlp_param_roundtrip():
    X = rng.standard_normal((5, 2))
    y = rng.standard_normal((5, 3))
    m = MlpMapping(X, y, hidden_dim=4, seed=4)
    W1, b1, W2, b2 = m.unpack(m.theta)
    theta2 = m.pack(np.asarray(W1), np.asarray(b1), np.asarray(W2), np.asarray(b2))
    np.testing.assert_allclose(theta2, np.asarray(m.theta), rtol=1e-12)
    assert len(theta2) == 2 * 4 + 4 + 4 * 3 + 3


def test_point_log_likelihood():
    X = rng.standard_normal((6, 2))
    y = rng.standard_normal((6, 1))
    m = LinearMapping(X, y, seed=5)
    pll = np.asarray(m.point_log_likelihood(y, X))
    assert pll.shape == (6,)
    np.testing.assert_allclose(pll.sum(), m.log_likelihood() , rtol=1e-9)
