"""Special-function parity tests (reference ndlutil.cpp:9-167, testNdlutil.cpp).

Golden values come from scipy (same math the MATLAB fixtures encode) plus
finite-difference and identity checks on the erfcx-stabilized log-domain branches.
"""

import numpy as np
import scipy.special as sp
import jax
import jax.numpy as jnp

from gpc_tpu import ndlutil as nu


def test_erfcx_matches_scipy():
    x = np.concatenate([np.linspace(-5, 5, 101), np.array([10.0, 26.0, 30.0, 100.0, 1e4])])
    got = np.asarray(nu.erfcx(x))
    want = sp.erfcx(x)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_cum_gaussian_and_inverse():
    # 0.5*(1+erf(·)) cancels in the left tail (same formula as the reference's
    # cumGaussian, ndlutil.cpp:17-24) — absolute tolerance there, not relative.
    x = np.linspace(-8, 8, 41)
    np.testing.assert_allclose(np.asarray(nu.cum_gaussian(x)), sp.ndtr(x), rtol=1e-9, atol=1e-15)
    p = np.linspace(1e-10, 1 - 1e-10, 21)
    np.testing.assert_allclose(np.asarray(nu.inv_cum_gaussian(p)), sp.ndtri(p), rtol=1e-8, atol=1e-10)


def test_ln_cum_gaussian_deep_tail():
    # log Φ(x) for very negative x must not be -inf (the whole point of erfcx)
    x = np.array([-1.0, -5.0, -10.0, -20.0, -37.0])
    got = np.asarray(nu.ln_cum_gaussian(x))
    want = sp.log_ndtr(x)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert np.all(np.isfinite(got))


def test_grad_ln_cum_gaussian():
    x = np.array([-30.0, -5.0, -0.5, 0.0, 0.5, 5.0])
    got = np.asarray(nu.grad_ln_cum_gaussian(x))
    want = sp.norm.pdf(x) / sp.ndtr(x) if hasattr(sp, "norm") else None
    want = np.exp(-0.5 * x * x) / np.sqrt(2 * np.pi) / sp.ndtr(x)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # consistency with autodiff of ln_cum_gaussian
    ad = np.asarray(jax.vmap(jax.grad(lambda t: nu.ln_cum_gaussian(t)))(jnp.asarray(x)))
    np.testing.assert_allclose(ad, want, rtol=1e-8)


def test_ln_diff_cum_gaussian():
    cases = [(1.0, 0.5), (0.5, -0.5), (-2.0, -3.0), (-10.0, -11.0), (8.0, 7.0)]
    for u, up in cases:
        got = float(nu.ln_diff_cum_gaussian(u, up))
        # stable oracle: for u,u' ≫ 0, Φ(u)−Φ(u') = Φ(−u')−Φ(−u) avoids
        # subtracting two near-1 doubles
        if u > 0 and up > 0:
            want = np.log(sp.ndtr(-up) - sp.ndtr(-u))
        else:
            want = np.log(sp.ndtr(u) - sp.ndtr(up))
        np.testing.assert_allclose(got, want, rtol=1e-8, err_msg=f"u={u} u'={up}")


def test_ln_cum_gauss_sum():
    for (u1, u2, w1, w2) in [(1.0, 2.0, 0.3, 0.7), (-5.0, -1.0, 0.5, 0.5), (-20.0, -22.0, 0.9, 0.1)]:
        got = float(nu.ln_cum_gauss_sum(u1, u2, w1, w2))
        want = np.log(w1 * sp.ndtr(u1) + w2 * sp.ndtr(u2))
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_sigmoid_roundtrip():
    x = np.linspace(-10, 10, 21)
    np.testing.assert_allclose(np.asarray(nu.inv_sigmoid(nu.sigmoid(x))), x, rtol=1e-9, atol=1e-9)


def test_erfcinv():
    x = np.linspace(1e-8, 2 - 1e-8, 51)
    np.testing.assert_allclose(np.asarray(nu.erfcinv(x)), sp.erfcinv(x), rtol=1e-9, atol=1e-12)
