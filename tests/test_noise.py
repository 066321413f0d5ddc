"""Noise model parity tests (reference CNoise.cpp, testNoise.cpp pattern).

Log-likelihoods are checked against direct scipy transcriptions; grad_inputs
against jax.grad of the pointwise log-likelihood (the reference's hand-derived
formulas must agree with autodiff); ADF site updates against the closed forms.
"""

import numpy as np
import scipy.special as sp
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu import noise as NZ

rng = np.random.default_rng(3)
N, D = 12, 2
MU = rng.standard_normal((N, D))
VS = 0.5 + rng.random((N, D))


def _autodiff_grad_inputs(model, p, mu, vs, y):
    gmu = jax.grad(lambda m: model.log_likelihood(p, m, jnp.asarray(vs), jnp.asarray(y)))(jnp.asarray(mu))
    gvs = jax.grad(lambda v: model.log_likelihood(p, jnp.asarray(mu), v, jnp.asarray(y)))(jnp.asarray(vs))
    return np.asarray(gmu), np.asarray(gvs)


def test_gaussian_loglik_and_grads():
    m = NZ.GaussianNoise(output_dim=D)
    y = MU + 0.3 * rng.standard_normal((N, D))
    p = jnp.asarray(np.concatenate([[0.1, -0.2], [0.5]]))
    got = float(m.log_likelihood(p, jnp.asarray(MU), jnp.asarray(VS), jnp.asarray(y)))
    var = VS + 0.5
    want = np.sum(-0.5 * (np.log(2 * np.pi * var) + (y - MU - np.array([0.1, -0.2])) ** 2 / var))
    np.testing.assert_allclose(got, want, rtol=1e-10)
    gmu, gvs = m.grad_inputs(p, jnp.asarray(MU), jnp.asarray(VS), jnp.asarray(y))
    amu, avs = _autodiff_grad_inputs(m, p, MU, VS, y)
    np.testing.assert_allclose(np.asarray(gmu), amu, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gvs), avs, rtol=1e-9)


def test_gaussian_sites():
    m = NZ.GaussianNoise(output_dim=D)
    y = rng.standard_normal((N, D))
    p = jnp.asarray(np.concatenate([[0.1, -0.2], [0.5]]))
    nu, g = m.nu_g(p, jnp.asarray(MU), jnp.asarray(VS), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(nu), 1 / (VS + 0.5), rtol=1e-10)
    ms, beta = m.update_sites(p, jnp.asarray(MU), jnp.asarray(VS), jnp.asarray(y), nu, g)
    np.testing.assert_allclose(np.asarray(beta), np.full((N, D), 2.0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ms), y - np.array([0.1, -0.2]), rtol=1e-12)


def test_probit_loglik_matches_scipy():
    m = NZ.ProbitNoise(output_dim=D)
    y = np.sign(rng.standard_normal((N, D)))
    p = jnp.asarray([0.3, -0.1])
    got = float(m.log_likelihood(p, jnp.asarray(MU), jnp.asarray(VS), jnp.asarray(y)))
    want = np.sum(sp.log_ndtr(y * (MU + np.array([0.3, -0.1])) / np.sqrt(VS + 1e-6)))
    np.testing.assert_allclose(got, want, rtol=1e-9)
    gmu, gvs = m.grad_inputs(p, jnp.asarray(MU), jnp.asarray(VS), jnp.asarray(y))
    amu, avs = _autodiff_grad_inputs(m, p, MU, VS, y)
    np.testing.assert_allclose(np.asarray(gmu), amu, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(gvs), avs, rtol=1e-7)


def test_probit_out_and_metric():
    m = NZ.ProbitNoise(output_dim=1)
    mu = jnp.asarray([[0.5], [-0.5]])
    vs = jnp.ones((2, 1))
    p = jnp.asarray([0.0])
    np.testing.assert_allclose(np.asarray(m.out(p, mu, vs)), [[1.0], [-1.0]])
    err = m.test_metric(p, mu, vs, jnp.asarray([[1.0], [1.0]]))
    np.testing.assert_allclose(np.asarray(err), [0.5])


def test_ncnm_labeled_reduces_to_shifted_probit():
    m = NZ.NcnmNoise(output_dim=1, width=1.0)
    y = np.array([[1.0], [-1.0], [0.0]])
    mu = np.array([[0.4], [-0.3], [0.1]])
    vs = np.array([[0.2], [0.4], [0.3]])
    gamma = 0.25
    p = jnp.asarray([0.1, gamma])
    got = float(m.log_likelihood(p, jnp.asarray(mu), jnp.asarray(vs), jnp.asarray(y)))
    c = 1 / np.sqrt(1e-6 + vs)
    l0 = sp.log_ndtr(float((mu[0, 0] + 0.1 - 0.5) * c[0, 0])) + np.log(1 - gamma)
    l1 = sp.log_ndtr(float(-(mu[1, 0] + 0.1 + 0.5) * c[1, 0])) + np.log(1 - gamma)
    u = float((mu[2, 0] + 0.1 + 0.5) * c[2, 0])
    up = float((mu[2, 0] + 0.1 - 0.5) * c[2, 0])
    l2 = np.log(gamma * sp.ndtr(-u) + gamma * sp.ndtr(up))
    np.testing.assert_allclose(got, l0 + l1 + l2, rtol=1e-9)


def test_ncnm_grads_match_autodiff():
    m = NZ.NcnmNoise(output_dim=1)
    y = np.array([[1.0], [-1.0], [0.0], [1.0]])
    mu = np.array([[0.4], [-0.3], [0.1], [2.0]])
    vs = np.array([[0.2], [0.4], [0.3], [0.6]])
    p = jnp.asarray([0.05, 0.3])
    gmu, gvs = m.grad_inputs(p, jnp.asarray(mu), jnp.asarray(vs), jnp.asarray(y))
    amu, avs = _autodiff_grad_inputs(m, p, mu, vs, y)
    np.testing.assert_allclose(np.asarray(gmu), amu, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(gvs), avs, rtol=1e-7)
    # non-log-concave: nu must be clamped positive
    nu, _ = m.nu_g(p, jnp.asarray(mu), jnp.asarray(vs), jnp.asarray(y))
    assert np.all(np.asarray(nu) > 0)


def test_ordered_loglik_and_grads():
    C = 4
    m = NZ.OrderedNoise(output_dim=1, num_categories=C)
    y = np.array([[0.0], [1.0], [2.0], [3.0], [np.nan]])
    mu = np.array([[-0.5], [0.2], [0.8], [1.5], [0.0]])
    vs = 0.3 * np.ones((5, 1))
    p = jnp.asarray([0.1, 0.6, 0.7])  # bias + 2 widths
    got = float(m.log_likelihood(p, jnp.asarray(mu), jnp.asarray(vs), jnp.asarray(y)))
    c = 1 / np.sqrt(0.1 + 0.3)
    madj = mu[:, 0] + 0.1
    w = [0.6, 0.7]
    want = sp.log_ndtr(-madj[0] * c)
    want += np.log(sp.ndtr(madj[1] * c) - sp.ndtr((madj[1] - w[0]) * c))
    want += np.log(sp.ndtr((madj[2] - w[0]) * c) - sp.ndtr((madj[2] - w[0] - w[1]) * c))
    want += sp.log_ndtr((madj[3] - w[0] - w[1]) * c)
    np.testing.assert_allclose(got, want, rtol=1e-8)
    gmu, gvs = m.grad_inputs(p, jnp.asarray(mu), jnp.asarray(vs), jnp.asarray(y))
    amu, avs = _autodiff_grad_inputs(m, p, mu, vs, y)
    np.testing.assert_allclose(np.asarray(gmu), amu, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gvs), avs, rtol=1e-6, atol=1e-10)


def test_scale_noise_out():
    m = NZ.ScaleNoise(output_dim=2)
    y = rng.standard_normal((N, 2)) * np.array([2.0, 0.5]) + np.array([1.0, -1.0])
    p = jnp.asarray(m.default_params(y))
    out = np.asarray(m.out(p, jnp.asarray(MU), jnp.asarray(VS)))
    bias, scale = p[:2], p[2:]
    np.testing.assert_allclose(out, MU * np.asarray(scale) + np.asarray(bias), rtol=1e-10)


def test_factory():
    assert NZ.make_noise("probit", 3).kind == "probit"
    assert NZ.make_noise("ordered", 1, num_categories=5).n_params == 4
    with pytest.raises(ValueError):
        NZ.make_noise("nope", 1)
