"""Prior distribution parity tests (reference CDist.cpp, testDist.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.stats

from gpc_tpu import priors


def test_gaussian_log_prob():
    p = priors.gaussian(precision=2.0)
    x = np.array([0.0, 1.0, -2.5])
    want = scipy.stats.norm.logpdf(x, scale=np.sqrt(1 / 2.0))
    np.testing.assert_allclose(np.asarray(p.log_prob(x)), want, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.grad_input(x)), -2.0 * x, rtol=1e-12)


def test_gamma_log_prob():
    p = priors.gamma(a=1.0, b=1.0)
    x = np.array([0.5, 1.0, 3.0])
    want = scipy.stats.gamma.logpdf(x, a=1.0, scale=1.0)
    np.testing.assert_allclose(np.asarray(p.log_prob(x)), want, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.grad_input(x)), (1.0 - 1.0) / x - 1.0, rtol=1e-12)


def test_wang_log_prob():
    p = priors.wang(M=3.0)
    x = np.array([0.5, 2.0])
    np.testing.assert_allclose(np.asarray(p.log_prob(x)), -3.0 * np.log(x), rtol=1e-12)


def test_grad_input_matches_autodiff():
    for p in (priors.gaussian(0.7), priors.gamma(2.0, 3.0), priors.wang(2.0)):
        x = jnp.asarray(1.7)
        ad = jax.grad(p.log_prob)(x)
        np.testing.assert_allclose(float(ad), float(p.grad_input(x)), rtol=1e-10)


def test_total_log_prob():
    ps = [priors.gamma(1.0, 1.0, index=0), priors.gamma(1.0, 1.0, index=2)]
    params = jnp.array([1.0, 5.0, 2.0])
    want = float(ps[0].log_prob(1.0) + ps[1].log_prob(2.0))
    np.testing.assert_allclose(float(priors.total_log_prob(ps, params)), want, rtol=1e-12)
    assert float(priors.total_log_prob([], params)) == 0.0
