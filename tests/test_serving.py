"""GPServer (gpc_tpu/serving.py): factored batch prediction ≡ GP.predict.

Pins the factor-once/serve-chunks decomposition against the reference-parity
posterior (CGp::posteriorMeanVar, CGp.cpp:548-663) for the full and sparse
families, ragged batch tails, and the explicit-inverse variant.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.models.gp import GP
from gpc_tpu.serving import GPServer


def _model(approx, N=96, q=2, seed=0, **kw):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((N, q))
    y = np.sin(X[:, :1]) + 0.05 * rng.standard_normal((N, 1))
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
    return GP(kern, X, y, approx=approx, centre=True, seed=seed, **kw), rng


@pytest.mark.parametrize("approx,kw", [
    ("ftc", {}),
    ("dtc", {"num_active": 12}),
    ("fitc", {"num_active": 12}),
])
def test_server_matches_predict(approx, kw):
    model, rng = _model(approx, **kw)
    Xt = rng.standard_normal((37, 2))
    want_mu, want_var = model.predict(Xt)
    srv = GPServer(model, chunk=16)   # 37 = 2 full chunks + ragged tail of 5
    mu, var = srv.predict(Xt)
    np.testing.assert_allclose(mu, np.asarray(want_mu), rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(var, np.asarray(want_var), rtol=1e-10,
                               atol=1e-12)


def test_server_explicit_inverse():
    model, rng = _model("ftc")
    Xt = rng.standard_normal((24, 2))
    want_mu, want_var = model.predict(Xt)
    srv = GPServer(model, chunk=24, explicit_inverse=True)
    mu, var = srv.predict(Xt)
    np.testing.assert_allclose(mu, np.asarray(want_mu), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(var, np.asarray(want_var), rtol=1e-9,
                               atol=1e-11)


def test_server_empty_request():
    model, _ = _model("ftc")
    srv = GPServer(model, chunk=16)
    mu, var = srv.predict(np.zeros((0, 2)))
    assert mu.shape == (0, 1) and var.shape == (0, 1)


def test_blocked_tri_inv():
    from gpc_tpu.linalg import blocked_tri_inv

    rng = np.random.default_rng(3)
    A = rng.standard_normal((96, 8))
    Kd = jnp.asarray(A @ A.T * 0.1 + np.eye(96))
    L = jnp.linalg.cholesky(Kd)
    Minv = blocked_tri_inv(L, block=32)
    np.testing.assert_allclose(np.asarray(Minv @ L), np.eye(96),
                               rtol=0, atol=1e-10)
    # strictly upper triangle is exactly zero
    assert float(jnp.abs(jnp.triu(Minv, 1)).max()) == 0.0


def test_server_sharded_batches():
    """Multi-chip serving: chunk rows sharded over the mesh (GSPMD) must
    reproduce the single-device predictions exactly."""
    import jax
    from gpc_tpu.parallel.mesh import data_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = data_mesh(8)
    model, rng = _model("ftc")
    Xt = rng.standard_normal((52, 2))   # ragged vs chunk 16
    want_mu, want_var = model.predict(Xt)
    srv = GPServer(model, chunk=16, mesh=mesh)
    mu, var = srv.predict(Xt)
    np.testing.assert_allclose(mu, np.asarray(want_mu), rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(var, np.asarray(want_var), rtol=1e-10,
                               atol=1e-12)


def test_server_bucket_padding_bounds_compiles():
    """A stream of varied small request sizes is padded to power-of-two
    buckets: the compiled-program set stays bounded (one program per bucket,
    not per distinct T) and every answer still matches GP.predict."""
    model, rng = _model("ftc")
    srv = GPServer(model, chunk=64)
    sizes = [1, 2, 3, 3, 4, 5, 6, 7, 7, 8, 9, 13, 15]
    for t in sizes:
        Xt = rng.standard_normal((t, 2))
        want_mu, want_var = model.predict(Xt)
        mu, var = srv.predict(Xt)
        np.testing.assert_allclose(mu, np.asarray(want_mu), rtol=1e-10,
                                   atol=1e-12)
        np.testing.assert_allclose(var, np.asarray(want_var), rtol=1e-10,
                                   atol=1e-12)
    # buckets hit: 1, 2, 4, 8, 16 — five compiled shapes for 13 requests
    assert srv._apply._cache_size() <= 5, srv._apply._cache_size()


def _ivm_model(N=120, seed=2, num_active=16):
    from gpc_tpu.models.ivm import IVM
    from gpc_tpu.noise import ProbitNoise as Probit

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((N, 2))
    y = np.where(X[:, :1] + 0.3 * rng.standard_normal((N, 1)) > 0, 1.0, -1.0)
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    model = IVM(kern, Probit(output_dim=1), X, y, num_active=num_active, seed=3)
    model.optimise(ext_iters=1, kern_iters=20, noise_iters=20)
    return model, rng


def test_ivm_server_matches_predict():
    from gpc_tpu.serving import IvmServer

    model, rng = _ivm_model()
    srv = IvmServer(model, chunk=16)
    for t in (5, 16, 37):
        Xt = rng.standard_normal((t, 2))
        want_mu, want_vs = model.predict(Xt)
        mu, vs = srv.predict(Xt)
        np.testing.assert_allclose(mu, np.asarray(want_mu), rtol=1e-10,
                                   atol=1e-12)
        np.testing.assert_allclose(vs, np.asarray(want_vs), rtol=1e-10,
                                   atol=1e-12)
        np.testing.assert_allclose(srv.out(Xt), np.asarray(model.out(Xt)),
                                   rtol=1e-10, atol=1e-12)


def test_ivm_server_refresh_tracks_relearn():
    """Serve-while-training: after more optimise() rounds, refresh() re-factors
    in place and the served predictions match the updated model."""
    from gpc_tpu.serving import IvmServer

    model, rng = _ivm_model()
    srv = IvmServer(model, chunk=16)
    Xt = rng.standard_normal((23, 2))
    stale_mu, _ = srv.predict(Xt)

    model.optimise(ext_iters=2, kern_iters=20, noise_iters=20)
    srv.refresh(model)
    mu, vs = srv.predict(Xt)
    want_mu, want_vs = model.predict(Xt)
    np.testing.assert_allclose(mu, np.asarray(want_mu), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(vs, np.asarray(want_vs), rtol=1e-10, atol=1e-12)
    assert np.abs(mu - stale_mu).max() > 1e-8  # training actually moved it


def test_gp_server_refresh_tracks_relearn():
    model, rng = _model("ftc")
    from gpc_tpu.serving import GPServer

    srv = GPServer(model, chunk=16)
    Xt = rng.standard_normal((21, 2))
    model.optimise(iters=15)
    srv.refresh(model)
    mu, var = srv.predict(Xt)
    want_mu, want_var = model.predict(Xt)
    np.testing.assert_allclose(mu, np.asarray(want_mu), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(var, np.asarray(want_var), rtol=1e-10,
                               atol=1e-12)


def test_server_small_request_single_chunk():
    model, rng = _model("ftc")
    srv = GPServer(model, chunk=64)
    Xt = rng.standard_normal((7, 2))
    want_mu, want_var = model.predict(Xt)
    mu, var = srv.predict(Xt)
    np.testing.assert_allclose(mu, np.asarray(want_mu), rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(var, np.asarray(want_var), rtol=1e-10,
                               atol=1e-12)


def test_gp_server_refresh_tracks_new_model_bias():
    """refresh(new_model) must serve the NEW model's bias/scales — not the
    construction-time closure's (a retrain on re-centred data changes bias =
    column means under centre=True)."""
    from gpc_tpu.serving import GPServer

    model, rng = _model("ftc")
    srv = GPServer(model, chunk=16)
    # a second model on SHIFTED data: different column means => different bias
    X2 = rng.standard_normal((96, 2))
    y2 = 3.0 + np.sin(X2[:, :1]) + 0.05 * rng.standard_normal((96, 1))
    kern2 = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    model2 = GP(kern2, X2, y2, approx="ftc", centre=True, seed=1)
    assert abs(float(model2.bias[0]) - float(model.bias[0])) > 1.0
    srv.refresh(model2)
    Xt = rng.standard_normal((17, 2))
    mu, var = srv.predict(Xt)
    want_mu, want_var = model2.predict(Xt)
    np.testing.assert_allclose(mu, np.asarray(want_mu), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(var, np.asarray(want_var), rtol=1e-10,
                               atol=1e-12)
