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


# DTC's collapsed-evidence matrix A = K_uu/β + K_uf·K_fu has cond ≈ 1e9 at
# β=1000, so LAPACK (MATLAB/C++) and XLA reach slightly different solves —
# gradients agree to ~3e-3 relative (worst entries), ll to ~3e-9.  FTC/FITC are exact.
_GRAD_TOL = {"testGpftc": (1e-7, 1e-9), "testGpdtc": (5e-3, 1e-2),
             "testGpfitc": (1e-5, 1e-6)}


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
    g = jax.grad(lambda t: log_likelihood(
        spec, t, jnp.asarray(X), jnp.asarray(y), jnp.asarray(bias),
        jnp.asarray(scale)))(theta)
    rtol, atol = _GRAD_TOL[name]
    np.testing.assert_allclose(np.asarray(g), d["grads"].ravel(), rtol=rtol,
                               atol=atol, err_msg=f"{name} grads")
