"""Serialization round-trip tests (reference §2.4 stream format; testKern.cpp
round-trip pattern, testKern.cpp:380-409)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu import priors as pr
from gpc_tpu.io import model_io
from gpc_tpu.io.svml import read_svml_py, write_svml


def _roundtrip_kern(kern, params, tmp_path):
    w = model_io.Writer()
    model_io.write_kern(w, kern, params)
    r = model_io.Reader(w.text())
    kern2, params2 = model_io.read_kern(r)
    return kern2, params2


def test_kern_roundtrip_all_types(tmp_path):
    rng = np.random.default_rng(0)
    for kind in ["white", "bias", "rbf", "exp", "ratquad", "matern32",
                 "matern52", "lin", "mlp", "poly", "linard", "rbfard",
                 "mlpard", "polyard"]:
        kern = K.make_kern(kind, 3)
        p = kern.default_params() * (0.5 + rng.random(kern.n_params))
        k2, p2 = _roundtrip_kern(kern, p, tmp_path)
        assert k2.kind == kind
        assert k2.input_dim == 3
        np.testing.assert_allclose(p2, p, rtol=1e-15, err_msg=kind)


def test_compound_kern_roundtrip_with_priors(tmp_path):
    rbf = K.Rbf(input_dim=2).with_priors([pr.gamma(1.0, 1.0, index=1)])
    kern = K.Cmpnd(input_dim=2, components=(
        rbf, K.Poly(input_dim=2, degree=3.0), K.Bias(input_dim=2),
        K.White(input_dim=2)))
    p = kern.default_params()
    k2, p2 = _roundtrip_kern(kern, p, tmp_path)
    assert k2.kind == "cmpnd" and len(k2.components) == 4
    assert k2.components[1].degree == 3.0
    assert len(k2.components[0].priors) == 1
    assert k2.components[0].priors[0].kind == "gamma"
    np.testing.assert_allclose(p2, p, rtol=1e-15)


def test_tensor_and_whitefixed_roundtrip(tmp_path):
    kern = K.Tensor(input_dim=2, components=(K.Rbf(input_dim=2), K.Lin(input_dim=2)))
    p = kern.default_params()
    k2, p2 = _roundtrip_kern(kern, p, tmp_path)
    assert k2.kind == "tensor" and len(k2.components) == 2
    wf = K.WhiteFixed(input_dim=2, fixed_variance=0.123)
    k3, _ = _roundtrip_kern(wf, np.zeros(0), tmp_path)
    assert k3.fixed_variance == pytest.approx(0.123)


def test_gp_model_file_roundtrip(tmp_path):
    from gpc_tpu.models.gp import GP
    rng = np.random.default_rng(1)
    X = rng.standard_normal((15, 2))
    y = np.sin(X[:, :1])
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    model = GP(kern, X, y, approx="dtc", num_active=5, centre=True, beta=3.3, seed=7)
    path = os.path.join(tmp_path, "m")
    model_io.write_gp(path, model, comment="test comment")
    m2 = model_io.read_gp(path, X=X, y=y)
    assert m2.spec.approx == "dtc" and m2.spec.num_active == 5
    np.testing.assert_allclose(m2.kern_params(), model.kern_params(), rtol=1e-14)
    np.testing.assert_allclose(m2.beta(), model.beta(), rtol=1e-14)
    np.testing.assert_allclose(m2.inducing(), model.inducing(), rtol=1e-14)
    np.testing.assert_allclose(m2.bias, model.bias, rtol=1e-14)
    np.testing.assert_allclose(m2.log_likelihood(), model.log_likelihood(), rtol=1e-10)


def test_noise_stream_roundtrip():
    for ntype, params, extra in [
            ("gaussian", np.array([0.1, -0.2, 1e-6]), {}),
            ("probit", np.array([0.3]), {}),
            ("ncnm", np.array([0.2, 0.4]), {"gammaSplit": 0}),
            ("ordered", np.array([0.1, 0.5, 0.6]), {"numCategories": 4})]:
        D = 2 if ntype == "gaussian" else 1
        w = model_io.Writer()
        model_io.write_noise(w, ntype, params, D, n_data=7, extra=extra)
        r = model_io.Reader(w.text())
        t2, p2, d2, e2 = model_io.read_noise(r)
        assert t2 == ntype and d2 == D
        np.testing.assert_allclose(p2, params, rtol=1e-15)
        for k, v in extra.items():
            assert e2[k] == v


def test_svml_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    X = rng.standard_normal((12, 4))
    X[X < 0] = 0.0  # sparsity
    X[:, -1] = 1.0  # ensure max feature index present
    y = rng.standard_normal(12)
    path = os.path.join(tmp_path, "d.svml")
    write_svml(path, X, y)
    X2, y2 = read_svml_py(path)
    np.testing.assert_allclose(X2, X, rtol=1e-15)
    np.testing.assert_allclose(y2[:, 0], y, rtol=1e-15)


def test_reference_comment_lines_skipped():
    X, y = read_svml_py("/root/reference/examples/unitsquaregp.svml")
    assert X.shape == (500, 2)
    assert set(np.unique(y)) == {-1.0, 1.0}


def test_gp_fixed_inducing_roundtrip(tmp_path):
    """fixInducing must survive save/load: inducing inputs stay data, not
    parameters (review finding: previously silently became trainable)."""
    from gpc_tpu.models.gp import GP
    import jax
    rng = np.random.default_rng(4)
    X = rng.standard_normal((20, 2))
    y = np.sin(X[:, :1])
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    model = GP(kern, X, y, approx="dtc", num_active=6, centre=True, beta=2.0,
               seed=1, inducing_fixed=True)
    # theta holds no X_u block
    assert model.theta.shape[0] == kern.n_params + 1
    ll = model.log_likelihood()
    assert np.isfinite(ll)
    g = jax.grad(model._objective)(model.theta)
    assert np.all(np.isfinite(np.asarray(g)))
    path = os.path.join(tmp_path, "fx")
    model_io.write_gp(path, model)
    m2 = model_io.read_gp(path, X=X, y=y)
    assert m2.spec.inducing_fixed
    np.testing.assert_allclose(m2.inducing(), model.inducing(), rtol=1e-14)
    np.testing.assert_allclose(m2.log_likelihood(), ll, rtol=1e-10)


def test_gp_ncnm_noise_numdata_roundtrip(tmp_path):
    """write_gp must serialize the ncnm noise block with numData =
    spec.n_data and the preserved gammaSplit — the reference reader sizes
    per-data site storage from numData (CNoise.cpp:1376-1387), so the
    write_noise default of 1 corrupts reference-side loads."""
    import numpy as np
    from gpc_tpu import kernels as K
    from gpc_tpu.models.gp import GP
    from gpc_tpu.io import model_io as mio

    rng = np.random.default_rng(0)
    N = 14
    X = rng.standard_normal((N, 2))
    y = np.sign(rng.standard_normal((N, 1)))
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    model = GP(kern, X, y, centre=False)
    model.noise_type = "ncnm"
    model.noise_params = np.array([0.0, 0.1, 0.1, 1.0])
    model.noise_extra = {"gammaSplit": 1}
    path = str(tmp_path / "ncnm_gp")
    mio.write_gp(path, model)
    text = open(path).read()
    assert f"numData={N}" in text
    assert "gammaSplit=1" in text
    back = mio.read_gp(path, X=X, y=y)
    assert back.noise_type == "ncnm"
    assert int(back.noise_extra["numData"]) == N
    assert int(back.noise_extra["gammaSplit"]) == 1
