"""GP-model-level MATLAB golden parity (testGp.cpp pattern).

The fixtures (testGp{ftc,dtc,fitc}.mat) hold the reference optimizer parameter
vector (`params` — transformed space, CGp::getOptParams layout), the MATLAB
log-likelihood `ll`, and its gradient `grads` for a cmpnd(rbf, lin, bias,
white) kernel on N=500 data with M=50 inducing points.  Our theta layout is
getOptParams-compatible, so `params` drops straight into log_likelihood and
jax.grad.  The reference's own testGp only enables DTC (testGp.cpp:21-24);
we check FTC and DTC (the FITC fixture was generated from a different MATLAB
FITC variant — see test note).
"""

import numpy as np
import scipy.io as sio
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.models.gp import GpSpec, log_likelihood

MATDIR = "/root/reference/matfiles"


def _setup(name):
    d = sio.loadmat(f"{MATDIR}/{name}.mat", squeeze_me=False)
    X = d["X"]
    y = d["y"]
    approx_code = int(d["approxInt"][0, 0])
    num_active = int(d["numActive"][0, 0])
    approx = {0: "ftc", 1: "dtc", 2: "fitc", 3: "pitc", 4: "dtcvar"}[approx_code]
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Lin(input_dim=2), K.Bias(input_dim=2),
        K.White(input_dim=2)))
    spec = GpSpec(kern=kern, n_data=X.shape[0], input_dim=2, output_dim=1,
                  approx=approx, num_active=num_active if approx != "ftc" else 0)
    theta = jnp.asarray(d["params"].ravel().astype(np.float64))
    assert theta.shape[0] == spec.n_params(), (theta.shape, spec.n_params())
    bias = d["bias"].ravel().astype(np.float64)
    scale = d["scale"].ravel().astype(np.float64)
    return spec, theta, X, y, bias, scale, d


# DTC/DTCVAR factor A = K_uu/β + K_uf·K_fu through the L_uu-whitened
# Am = I/β + V·Vᵀ (models/gp.py, same whitening as the FITC branch); every
# non-inducing gradient then agrees with the MATLAB goldens to ≤1e-5.  The
# DTC fixture's INDUCING-INPUT gradient block is itself inaccurate: central
# finite differences of the NLML (trustworthy here to ~1e-7 — ll matches
# MATLAB to 1e-7 rtol) agree with our jax.grad to ≤1e-5 but deviate from the
# fixture's X_u entries by up to 2.7e-3 (GPmat's hand-derived gpCovGrads at
# cond(A)≈1e9, fp64).  So X_u grads are asserted against the FD ground truth
# tightly and against the fixture only at its own accuracy.
_GRAD_TOL = {"testGpftc": (1e-7, 1e-9), "testGpdtc": (1e-5, 1e-6),
             "testGpfitc": (1e-5, 1e-6)}
_XU_FIXTURE_TOL = 5e-3


@pytest.mark.parametrize("name", ["testGpftc", "testGpdtc", "testGpfitc"])
def test_gp_loglik_and_grads_golden(name):
    spec, theta, X, y, bias, scale, d = _setup(name)
    # the MATLAB fixture ll omits the −(ND/2)·log 2π constant that both the
    # C++ reference (CGp.cpp:1012) and we include
    const = 0.5 * spec.n_data * spec.output_dim * np.log(2 * np.pi)
    ll = float(log_likelihood(spec, theta, jnp.asarray(X), jnp.asarray(y),
                              jnp.asarray(bias), jnp.asarray(scale)))
    np.testing.assert_allclose(ll + const, float(d["ll"][0, 0]), rtol=1e-7,
                               err_msg=f"{name} ll")
    g = np.asarray(jax.grad(lambda t: log_likelihood(
        spec, t, jnp.asarray(X), jnp.asarray(y), jnp.asarray(bias),
        jnp.asarray(scale)))(theta))
    gm = d["grads"].ravel()
    rtol, atol = _GRAD_TOL[name]
    if name != "testGpdtc":
        np.testing.assert_allclose(g, gm, rtol=rtol, atol=atol,
                                   err_msg=f"{name} grads")
        return
    nxu = spec.num_active * spec.input_dim  # θ leads with X_u column-major
    np.testing.assert_allclose(g[nxu:], gm[nxu:], rtol=rtol, atol=atol,
                               err_msg=f"{name} non-inducing grads")
    np.testing.assert_allclose(g[:nxu], gm[:nxu], rtol=_XU_FIXTURE_TOL,
                               atol=1e-2, err_msg=f"{name} X_u grads (fixture)")
    # ground truth: central finite differences on the worst-agreeing entries
    # (picked by ABSOLUTE deviation — FD noise is ~1e-7 absolute from the
    # ill-conditioned NLML, so only large-magnitude entries resolve 1e-4)
    f = lambda t: float(log_likelihood(
        spec, jnp.asarray(t), jnp.asarray(X), jnp.asarray(y),
        jnp.asarray(bias), jnp.asarray(scale)))
    th = np.array(theta, copy=True)
    abs_fix = np.abs(g[:nxu] - gm[:nxu])
    for i in np.argsort(abs_fix)[-3:]:
        h = 1e-6 * max(1.0, abs(th[i]))
        tp, tm = th.copy(), th.copy()
        tp[i] += h
        tm[i] -= h
        fd = (f(tp) - f(tm)) / (2 * h)
        assert abs(g[i] - fd) <= 1e-4 * max(abs(fd), 1.0), (
            f"{name} X_u grad {i}: ours {g[i]} vs FD {fd}")
