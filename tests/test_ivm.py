"""IVM tests (reference CIvm.cpp; testIvm.cpp pattern).

The strongest correctness check: with Gaussian noise the ADF rank-1 recursion
is exact, so after selecting ALL points the incremental posterior must equal
the closed-form GP posterior — and the site parameters must be (y−bias, 1/σ²).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu import noise as NZ
from gpc_tpu.models.ivm import IVM, IvmSpec, select_points, active_log_likelihood, posterior

rng = np.random.default_rng(5)


def _data(N=25, q=2):
    X = rng.standard_normal((N, q))
    y = np.sin(X[:, :1] * 2.0) + 0.05 * rng.standard_normal((N, 1))
    return X, y


def _kern(q):
    return K.Cmpnd(input_dim=q, components=(K.Rbf(input_dim=q), K.Bias(input_dim=q)))


def test_gaussian_full_active_set_matches_exact_gp():
    X, y = _data()
    N = X.shape[0]
    kern = _kern(2)
    noise = NZ.GaussianNoise(output_dim=1)
    sigma2 = 0.01
    npar = jnp.asarray(np.array([0.0, sigma2]))
    model = IVM(kern, noise, X, y, num_active=N, noise_params=npar, seed=0)
    st = model.init_and_select()

    kp = jnp.asarray(kern.default_params())
    Kmat = np.asarray(kern.gram(kp, jnp.asarray(X)))
    exact_cov = Kmat - Kmat @ np.linalg.solve(Kmat + sigma2 * np.eye(N), Kmat)
    exact_mu = Kmat @ np.linalg.solve(Kmat + sigma2 * np.eye(N), y)
    np.testing.assert_allclose(np.asarray(st.mu), exact_mu, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(st.varsigma)[:, 0], np.diag(exact_cov),
                               rtol=1e-6, atol=1e-8)
    # gaussian sites: beta = 1/sigma2, m = y - bias
    np.testing.assert_allclose(np.asarray(st.beta_site), np.full((N, 1), 1 / sigma2), rtol=1e-10)
    order = np.asarray(st.active_idx)
    np.testing.assert_allclose(np.asarray(st.m_site), y[order], rtol=1e-10)
    assert len(np.unique(order)) == N  # every point picked exactly once


def test_entropy_selection_prefers_high_variance():
    # two clusters; first selected point should come from the high-variance region
    X = np.vstack([np.zeros((10, 1)), np.ones((10, 1)) * 5])
    y = np.vstack([np.zeros((10, 1)), np.ones((10, 1))])
    kern = _kern(1)
    noise = NZ.GaussianNoise(output_dim=1)
    model = IVM(kern, noise, X, y, num_active=4, seed=1)
    st = model.init_and_select()
    idx = np.asarray(st.active_idx)
    # entropy selection must cover both clusters
    assert (idx < 10).any() and (idx >= 10).any()


def test_posterior_matches_training_points():
    X, y = _data()
    kern = _kern(2)
    noise = NZ.GaussianNoise(output_dim=1)
    model = IVM(kern, noise, X, y, num_active=15,
                noise_params=jnp.asarray([0.0, 0.01]), seed=2)
    model.init_and_select()
    mu, vs = model.predict(X)
    assert np.all(np.asarray(vs) > 0)
    # prediction at active points should be close to targets
    order = np.asarray(model.state.active_idx)
    err = np.abs(np.asarray(mu)[order] - y[order])
    assert np.median(err) < 0.2


def test_active_loglik_grad_finite_diff():
    X, y = _data(N=15)
    kern = _kern(2)
    noise = NZ.GaussianNoise(output_dim=1)
    model = IVM(kern, noise, X, y, num_active=8,
                noise_params=jnp.asarray([0.0, 0.05]), seed=3)
    st = model.init_and_select()
    Xa = jnp.asarray(model.active_X())
    from gpc_tpu import transforms as tr
    codes = kern.transform_codes()

    def obj(a):
        kp = tr.apply_atox(codes, a)
        return -active_log_likelihood(model.spec, kp, Xa, st.m_site, st.beta_site)

    a0 = np.asarray(tr.apply_xtoa(codes, model.kern_params))
    g = np.asarray(jax.grad(obj)(jnp.asarray(a0)))
    eps = 1e-6
    fd = np.zeros_like(a0)
    for i in range(len(a0)):
        ap, am = a0.copy(), a0.copy()
        ap[i] += eps; am[i] -= eps
        fd[i] = (float(obj(jnp.asarray(ap))) - float(obj(jnp.asarray(am)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-5, atol=1e-8)


def test_probit_ivm_classifies_separable_data():
    N = 40
    X = np.vstack([rng.standard_normal((N // 2, 2)) + 3.0,
                   rng.standard_normal((N // 2, 2)) - 3.0])
    y = np.vstack([np.ones((N // 2, 1)), -np.ones((N // 2, 1))])
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    noise = NZ.ProbitNoise(output_dim=1)
    model = IVM(kern, noise, X, y, num_active=20, seed=4)
    model.optimise(ext_iters=2, kern_iters=30, noise_iters=30)
    pred = np.asarray(model.out(X))
    acc = np.mean(pred == y)
    assert acc > 0.95, f"accuracy {acc}"


def test_random_selection_valid_permutation():
    X, y = _data(N=20)
    kern = _kern(2)
    noise = NZ.GaussianNoise(output_dim=1)
    model = IVM(kern, noise, X, y, num_active=10, selection="random", seed=5)
    st = model.init_and_select()
    idx = np.asarray(st.active_idx)
    assert len(np.unique(idx)) == 10


def test_select_point_remove():
    """Removal selection: entropy argmax over active slots; random in range;
    removal entropy change is positive (removing a site loses information)."""
    from gpc_tpu.models.ivm import select_point_remove

    X, y = _data(N=30)
    model = IVM(_kern(2), NZ.GaussianNoise(output_dim=1), X, y, num_active=10,
                seed=3)
    state = model.init_and_select()

    slot, data_idx, delta = select_point_remove(model.spec, state)
    slot, data_idx = int(slot), int(data_idx)
    assert 0 <= slot < 10
    assert data_idx == int(state.active_idx[slot])
    assert float(delta) > 0.0

    # random criterion maps the uniform draw to a valid slot (slot = ⌊r·d⌋)
    import dataclasses
    spec_r = dataclasses.replace(model.spec, selection="random")
    slot_r, idx_r, _ = select_point_remove(spec_r, state, r=0.73)
    assert int(slot_r) == 7
    assert int(idx_r) == int(state.active_idx[7])
    slot_edge, _, _ = select_point_remove(spec_r, state, r=0.9999999)
    assert int(slot_edge) == 9


def test_random_selection_reference_stream():
    """RANDOM/RENTROPY selection consumes the reference-exact MT19937 stream:
    the scan's rank-among-inactive mapping must reproduce the reference's
    draw-and-erase loop `index = inactive[(int)(ndlutil::rand()·|inactive|)]`
    (CIvm::randomPointAdd, CIvm.cpp:402-411) for the same seed."""
    import dataclasses
    from gpc_tpu.utils.refrng import RefRng

    X, y = _data(N=23)
    d = 9
    for selection in ("random", "rentropy"):
        model = IVM(_kern(2), NZ.GaussianNoise(output_dim=1), X, y,
                    num_active=d, seed=1042, selection=selection)
        st = model.init_and_select()
        got = [int(i) for i in np.asarray(st.active_idx)]

        if selection == "random":
            # host replication of the reference loop on the same stream
            rng = RefRng(1042)
            inactive = list(range(23))
            want = []
            for _ in range(d):
                pick = int(rng.rand() * len(inactive))
                want.append(inactive.pop(pick))
            assert got == want
        else:
            # rentropy: first point random from the stream, rest entropy
            rng = RefRng(1042)
            first = int(rng.rand() * 23)
            assert got[0] == first
            ent = IVM(_kern(2), NZ.GaussianNoise(output_dim=1), X, y,
                      num_active=d, seed=1042, selection="entropy")
            ent_idx = [int(i) for i in np.asarray(ent.init_and_select().active_idx)]
            assert got != ent_idx or first == ent_idx[0]

        # a second pass continues the stream (reference reuses the global RNG)
        st2 = model.init_and_select()
        if selection == "random":
            got2 = [int(i) for i in np.asarray(st2.active_idx)]
            inactive = list(range(23))
            want2 = []
            for _ in range(d):
                pick = int(rng.rand() * len(inactive))
                want2.append(inactive.pop(pick))
            assert got2 == want2
