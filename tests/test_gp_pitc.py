"""PITC sparse approximation (models/gp.py) — the reference STUBS this
(CGp.cpp:862-871 throws); here it is a working block-diagonal member of the
Quiñonero-Candela/Rasmussen family, so the checks are mathematical identities
rather than reference goldens:

  * block size 1  → FITC (up to FITC's documented double-log2π constant),
  * one block = N → exact GP with covariance Q + (K − Q) + I/β = K + I/β,
  * gradients finite & matching finite differences,
  * predictions at block size 1 ≡ FITC predictions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.stats

from gpc_tpu import kernels as K
from gpc_tpu import ndlutil
from gpc_tpu.models.gp import GP, GpSpec, log_likelihood, posterior


def _data(n=40, q=2, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, q))
    y = np.sin(X[:, :d]) + 0.1 * rng.standard_normal((n, d))
    return X, y


def _kern(q):
    return K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q)))


def test_pitc_block1_equals_fitc():
    X, y = _data()
    kern = _kern(2)
    fitc = GP(kern, X, y, approx="fitc", num_active=7, centre=True, seed=3)
    pitc = GP(kern, X, y, approx="pitc", num_active=7, centre=True, seed=3,
              pitc_block=1)
    # identical theta layout (same kernel/inducing/beta packing)
    np.testing.assert_allclose(np.asarray(fitc.theta), np.asarray(pitc.theta))
    n, d = y.shape
    # FITC carries the reference's double-log2π quirk; PITC uses the correct
    # constant — they differ by exactly D·N·½log2π.
    quirk = d * n * ndlutil.HALFLOGTWOPI
    assert abs(pitc.log_likelihood() - (fitc.log_likelihood() + quirk)) < 1e-8

    mu_f, var_f = fitc.predict(X[:11])
    mu_p, var_p = pitc.predict(X[:11])
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_f), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_f), atol=1e-9)


def test_pitc_single_block_is_exact_gp():
    X, y = _data(n=30)
    kern = _kern(2)
    model = GP(kern, X, y, approx="pitc", num_active=6, centre=True, seed=1,
               pitc_block=30, beta=4.0)
    # one block ⇒ covariance Q + (K − Q) + I/β = K + I/β exactly
    _, kp, _, beta = model.spec.unpack(model.theta)
    Kd = np.asarray(kern.gram(jnp.asarray(kp), jnp.asarray(X)))
    Sigma = Kd + np.eye(30) / float(beta)
    m = y - model.bias[None, :]
    want = sum(scipy.stats.multivariate_normal(mean=np.zeros(30),
                                               cov=Sigma).logpdf(m[:, j])
               for j in range(y.shape[1]))
    assert abs(model.log_likelihood() - want) < 1e-7 * abs(want)


def test_pitc_ragged_blocks_gradient():
    # N=25, block 7 → ragged tail exercises the identity padding
    X, y = _data(n=25, d=1)
    kern = _kern(2)
    model = GP(kern, X, y, approx="pitc", num_active=5, centre=True, seed=2,
               pitc_block=7)
    vag = jax.jit(jax.value_and_grad(model._objective))
    v0, g = vag(model.theta)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # central finite differences (the reference's checkGradients discipline)
    eps = 1e-6
    th = np.asarray(model.theta)
    for i in range(0, th.size, max(1, th.size // 6)):
        tp, tm = th.copy(), th.copy()
        tp[i] += eps
        tm[i] -= eps
        fd = (float(model._objective(jnp.asarray(tp)))
              - float(model._objective(jnp.asarray(tm)))) / (2 * eps)
        assert abs(fd - g[i]) < 1e-4 * max(1.0, abs(fd)), (i, fd, g[i])


def test_pitc_training_improves_and_roundtrips(tmp_path):
    X, y = _data(n=36, d=1)
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    model = GP(kern, X, y, approx="pitc", num_active=6, centre=True, seed=0)
    ll0 = model.log_likelihood()
    model.optimise(iters=30)
    assert model.log_likelihood() > ll0

    from gpc_tpu.io.model_io import write_gp, read_gp
    path = str(tmp_path / "pitc_model.txt")
    write_gp(path, model)
    back = read_gp(path, X=X, y=y)
    assert back.spec.approx == "pitc"
    assert abs(back.log_likelihood() - model.log_likelihood()) < 1e-8
