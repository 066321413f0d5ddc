"""BASELINE.json config: sparse approximations at N>=10k synthetic."""

import numpy as np
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.models.gp import GP


@pytest.mark.parametrize("approx", ["dtc", "fitc"])
def test_sparse_n10k_synthetic(approx):
    rng = np.random.default_rng(0)
    N, q, M = 10000, 4, 200
    X = rng.standard_normal((N, q))
    y = np.sin(X[:, :1] * 2) + 0.1 * rng.standard_normal((N, 1))
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
    m = GP(kern, X, y, approx=approx, num_active=M, centre=True, seed=0)
    # FITC converges more slowly here (diagD absorbs noise before beta does:
    # 30 iters -> beta 18.5/rmse 0.27; 100 iters -> rmse 0.117)
    res = m.optimise(iters=30 if approx == "dtc" else 100)
    assert np.isfinite(float(res.obj))
    # beta should approach the true noise precision 1/0.1^2 = 100
    if approx == "dtc":
        assert 30 < m.beta() < 300, m.beta()
    mu, var = m.predict(X[:200])
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - y[:200]) ** 2)))
    assert rmse < 0.2, rmse


def test_spgp1d_ard_compound_learned_scales():
    """BASELINE.json config #2 verbatim: spgp1d.svml full-rank (FTC) GP with
    an ARD-rbf + matern52 compound kernel and learned output scales/bias."""
    from gpc_tpu.io.svml import read_svml
    X, y = read_svml("/root/reference/examples/spgp1d.svml")
    q = X.shape[1]
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbfard(input_dim=q), K.Matern52(input_dim=q),
        K.Bias(input_dim=q), K.White(input_dim=q)))
    m = GP(kern, X, y, centre=True, learn_scales=True, scale_data=True,
           seed=0)
    obj0 = float(m._objective(m.theta))
    res = m.optimise(iters=40)
    assert np.isfinite(float(res.obj))
    assert float(res.obj) < obj0          # SCG made progress
    mu, _var = m.predict(X)
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - y) ** 2)))
    # spgp1d is a noisy 1-D sinc-like curve; the full GP should fit it well
    assert rmse < 0.25, rmse
