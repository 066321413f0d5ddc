"""Transform parity tests (reference CTransform.cpp:25-112, testTransform.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu import transforms as tr


def test_exp_roundtrip_and_clip():
    a = np.array([-50.0, -36.0, -1.0, 0.0, 2.5, 36.0, 50.0])
    x = np.asarray(tr.atox(tr.EXP, a))
    np.testing.assert_allclose(x, np.exp(np.clip(a, -36, 36)), rtol=1e-14)
    mid = np.array([0.01, 1.0, 7.3])
    np.testing.assert_allclose(np.asarray(tr.xtoa(tr.EXP, tr.atox(tr.EXP, mid))), mid, rtol=1e-12)


def test_negloglogit():
    a = np.array([-40.0, -5.0, 0.0, 5.0, 40.0])
    x = np.asarray(tr.atox(tr.NEGLOGLOGIT, a))
    want = np.maximum(np.where(a < 36, np.logaddexp(0, a), a), np.exp(-36.0))
    np.testing.assert_allclose(x, want, rtol=1e-12)
    mid = np.array([0.1, 1.0, 10.0])
    np.testing.assert_allclose(
        np.asarray(tr.atox(tr.NEGLOGLOGIT, tr.xtoa(tr.NEGLOGLOGIT, mid))), mid, rtol=1e-12
    )
    # gradfact (exp(x)-1)/exp(x) (CTransform.cpp:80-88)
    np.testing.assert_allclose(
        np.asarray(tr.gradfact(tr.NEGLOGLOGIT, mid)), (np.exp(mid) - 1) / np.exp(mid), rtol=1e-12
    )


def test_sigmoid():
    a = np.array([-5.0, 0.0, 5.0])
    x = np.asarray(tr.atox(tr.SIGMOID, a))
    np.testing.assert_allclose(x, 1 / (1 + np.exp(-a)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tr.xtoa(tr.SIGMOID, x)), a, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(tr.gradfact(tr.SIGMOID, x)), x * (1 - x), rtol=1e-12)


def test_gradfact_matches_autodiff():
    # gradfact(x) must equal d atox / da at a = xtoa(x) for every transform
    for code in (tr.EXP, tr.NEGLOGLOGIT, tr.SIGMOID, tr.LINEAR):
        xs = np.array([0.3, 0.9]) if code == tr.SIGMOID else np.array([0.5, 2.0])
        a = tr.xtoa(code, jnp.asarray(xs))
        d = jax.vmap(jax.grad(lambda t: tr.atox(code, t)))(a)
        np.testing.assert_allclose(np.asarray(d), np.asarray(tr.gradfact(code, xs)), rtol=1e-9)


def test_vectorized_mixed_codes():
    codes = np.array([tr.EXP, tr.SIGMOID, tr.LINEAR, tr.EXP])
    a = jnp.array([0.0, 0.0, 3.0, 1.0])
    x = np.asarray(tr.apply_atox(codes, a))
    np.testing.assert_allclose(x, [1.0, 0.5, 3.0, np.e], rtol=1e-12)
    back = np.asarray(tr.apply_xtoa(codes, jnp.asarray(x)))
    np.testing.assert_allclose(back, np.asarray(a), rtol=1e-12, atol=1e-12)
    # grad through apply_atox must not be poisoned by unused branches
    g = jax.grad(lambda t: jnp.sum(tr.apply_atox(codes, t)))(a)
    assert np.all(np.isfinite(np.asarray(g)))
