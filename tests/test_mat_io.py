"""MATLAB .mat model interop (io/mat_io.py — the _NDLMATLAB CMatInterface
counterpart, CNdlInterfaces.h:191-446, CGp::to/fromMxArray CGp.cpp:1436-1521)."""

import numpy as np
import scipy.io as sio
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.io import mat_io


def _model(tmp_path, approx="dtc"):
    from gpc_tpu.models.gp import GP
    rng = np.random.default_rng(0)
    X = rng.standard_normal((40, 2))
    y = np.sin(X[:, :1])
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    m = GP(kern, X, y, approx=approx, num_active=8 if approx != "ftc" else 0,
           centre=True, seed=3)
    m.optimise(iters=5)
    return m, X, y


def test_gp_mat_roundtrip(tmp_path):
    model, X, y = _model(tmp_path)
    path = tmp_path / "gp.mat"
    mat_io.write_gp_mat(path, model, X=X, y=y)
    back = mat_io.read_gp_mat(path)
    assert back.spec.approx == "dtc"
    np.testing.assert_allclose(np.asarray(back.theta),
                               np.asarray(model.theta), rtol=1e-12)
    np.testing.assert_allclose(back.bias, model.bias)
    # same likelihood and predictions
    np.testing.assert_allclose(back.log_likelihood(), model.log_likelihood(),
                               rtol=1e-9)
    mu1, v1 = model.predict(X[:5])
    mu2, v2 = back.predict(X[:5])
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu1), rtol=1e-9)


def test_gp_mat_roundtrip_ftc(tmp_path):
    model, X, y = _model(tmp_path, approx="ftc")
    path = tmp_path / "gpf.mat"
    mat_io.write_gp_mat(path, model, X=X, y=y)
    back = mat_io.read_gp_mat(path)
    np.testing.assert_allclose(back.log_likelihood(), model.log_likelihood(),
                               rtol=1e-9)


def test_kern_struct_matches_gpmat_fixture():
    """kern_from_struct parses a REAL MATLAB GPmat kern struct (written by
    the MATLAB toolbox into the reference fixture) and reproduces its K."""
    d = sio.loadmat("/root/reference/matfiles/rbfKernTest.mat",
                    squeeze_me=False)
    kern, params = mat_io.kern_from_struct(d["kern2"])
    assert kern.kind == "rbf"
    X = jnp.asarray(d["X"])
    Kgot = np.asarray(kern.compute(jnp.asarray(params), X, X))
    np.testing.assert_allclose(Kgot, d["K2"], rtol=1e-9, atol=1e-12)


def test_kern_struct_roundtrip_all_types():
    rng = np.random.default_rng(1)
    q = 3
    for kern in (K.Cmpnd(input_dim=q, components=(
            K.Rbf(input_dim=q), K.Matern52(input_dim=q),
            K.Poly(input_dim=q, degree=2), K.Rbfard(input_dim=q),
            K.Bias(input_dim=q), K.White(input_dim=q))),
                 K.Tensor(input_dim=q, components=(
                     K.Rbf(input_dim=q), K.Lin(input_dim=q)))):
        p = np.asarray(kern.default_params()) * (1 + 0.1 * rng.random(kern.n_params))
        s = mat_io.kern_to_struct(kern, p)
        # serialize through an actual .mat file to exercise scipy's struct coding
        import io as _io, tempfile, os
        with tempfile.TemporaryDirectory() as td:
            f = os.path.join(td, "k.mat")
            sio.savemat(f, {"kern": s})
            back = sio.loadmat(f, squeeze_me=False)["kern"]
        k2, p2 = mat_io.kern_from_struct(back)
        assert k2.kind == kern.kind
        np.testing.assert_allclose(p2, p, rtol=1e-12)
        X = jnp.asarray(rng.standard_normal((7, q)))
        np.testing.assert_allclose(
            np.asarray(k2.compute(jnp.asarray(p2), X, X)),
            np.asarray(kern.compute(jnp.asarray(p), X, X)), rtol=1e-12)


def test_noise_struct_named_field_fallback(tmp_path):
    """Reference/_NDLMATLAB noise structs carry NAMED parameter fields
    (bias, sigma2 — CNoise.cpp addParamToMxArray), never our writer's flat
    `params` vector; noise_from_struct must reconstruct from them."""
    # simulate a GPmat-written gaussian noise struct (no params field)
    path = str(tmp_path / "n.mat")
    sio.savemat(path, {"noise": {
        "type": "gaussian", "numProcess": 2.0, "numData": 5.0,
        "nParams": 3.0, "spherical": 1.0, "logconcave": 1.0, "missing": 0.0,
        "bias": np.array([[0.25, -0.5]]), "sigma2": 0.01}})
    s = sio.loadmat(path, squeeze_me=False)["noise"]
    ntype, params, _ = mat_io.noise_from_struct(s)
    assert ntype == "gaussian"
    np.testing.assert_allclose(params, [0.25, -0.5, 0.01])
    # probit: bias-only params
    sio.savemat(path, {"noise": {
        "type": "probit", "numProcess": 1.0, "numData": 5.0,
        "nParams": 1.0, "spherical": 1.0, "logconcave": 1.0, "missing": 0.0,
        "bias": np.array([[0.125]]), "sigma2": 1e-6}})
    s = sio.loadmat(path, squeeze_me=False)["noise"]
    ntype, params, _ = mat_io.noise_from_struct(s)
    assert ntype == "probit"
    np.testing.assert_allclose(params, [0.125])


def test_probit_noise_struct_sigma2_is_fixed_member():
    """probit params are bias-only; the serialized sigma2 must be the FIXED
    1e-6 member (CNoise.cpp:181-189), not the last bias."""
    s = mat_io.noise_to_struct("probit", np.array([0.43]), 1, 5)
    assert abs(s["sigma2"] - 1e-6) < 1e-12
    np.testing.assert_allclose(np.asarray(s["bias"]).ravel(), [0.43])
