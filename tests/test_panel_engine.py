"""ops/panel_engine — the panel mega-kernel as a model-reachable engine.

Interpret-mode (CPU) coverage of the product-engine features the bench never
exercised: the bias/white Sherman-Morrison split, ragged-N padding, multi-D
RHS, the custom-VJP gradients, and the GPC_TPU_EVIDENCE=panel routing
through models/gp.log_likelihood.  Tolerances are the bf16-input/f32-accum
policy's (as tests/test_chol_panel.py); gradient tolerance is the documented
bf16-factor level (~1e-2 relative).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpc_tpu import kernels as GK
from gpc_tpu.ops.panel_engine import kern_evidence_panel, panel_split

def _dense_ref(kern, p, X, m):
    """f64 reference evidence (logdet, quad) for K = kern.gram + white."""
    K = np.asarray(kern.gram(jnp.asarray(p, jnp.float64),
                             jnp.asarray(X, jnp.float64)), np.float64)
    _, ld = np.linalg.slogdet(K)
    quad = float((np.asarray(m, np.float64)
                  * np.linalg.solve(K, np.asarray(m, np.float64))).sum())
    return ld, quad


def _cmpnd(q, *kinds):
    comps = {"rbf": GK.Rbf(input_dim=q), "bias": GK.Bias(input_dim=q),
             "white": GK.White(input_dim=q),
             "whitefixed": GK.WhiteFixed(input_dim=q, fixed_variance=0.05),
             "matern32": GK.Matern32(input_dim=q)}
    return GK.Cmpnd(input_dim=q, components=tuple(comps[k] for k in kinds))


def test_panel_split_parses_cli_family():
    k = _cmpnd(3, "rbf", "bias", "white")
    rbf_off, bias_offs, white_offs, fw = panel_split(k)
    assert rbf_off == 0 and bias_offs == (2,) and white_offs == (3,)
    assert fw == 0.0
    # whitefixed contributes a constant, order-independent offsets
    k2 = _cmpnd(3, "bias", "rbf", "whitefixed")
    rbf_off, bias_offs, white_offs, fw = panel_split(k2)
    assert rbf_off == 1 and bias_offs == (0,) and white_offs == ()
    assert fw == pytest.approx(0.05)
    assert panel_split(GK.Rbf(input_dim=2)) == (0, (), (), 0.0)
    assert panel_split(_cmpnd(3, "rbf", "matern32", "white")) is None
    assert panel_split(GK.Matern32(input_dim=2)) is None


@pytest.mark.parametrize("N,D,with_bias", [(512, 2, False), (700, 1, True)])
def test_panel_engine_matches_dense(N, D, with_bias):
    """Exact-grid + ragged-N (pad) geometries, with and without the rank-1
    bias split, against the f64 dense evidence."""
    q = 4
    kinds = ("rbf", "bias", "white") if with_bias else ("rbf", "white")
    kern = _cmpnd(q, *kinds)
    rng = np.random.default_rng(100 + N)
    p = np.concatenate([np.array([2.0, 1.1])]
                       + ([np.array([0.3])] if with_bias else [])
                       + [np.array([0.15])])
    X = rng.standard_normal((N, q)).astype(np.float32)
    m = rng.standard_normal((N, D)).astype(np.float32)
    ld_ref, quad_ref = _dense_ref(kern, p, X, m)
    ld, quad = kern_evidence_panel(kern, jnp.asarray(p, jnp.float32),
                                   jnp.asarray(X), jnp.asarray(m))
    # bf16-factor drift: measured ~1e-3-4e-3 at these small-N geometries
    # (the bench gates the same engine class at 1e-2, bench.py:204-222)
    assert abs(float(ld) - ld_ref) / abs(ld_ref) < 1e-2
    assert abs(float(quad) - quad_ref) / abs(quad_ref) < 1e-2


def test_panel_engine_gradients_match_dense():
    """custom-VJP gradients (θ̄, X̄, m̄) vs autodiff through the dense
    route, at the documented bf16-factor tolerance — including pad-row and
    bias-split cotangents (N=700 pads to 1024)."""
    N, q, D = 700, 3, 1
    rng = np.random.default_rng(7)
    kern = _cmpnd(q, "rbf", "bias", "white")
    p0 = jnp.asarray(np.array([2.0, 1.2, 0.25, 0.2]), jnp.float32)
    X0 = jnp.asarray(rng.standard_normal((N, q)), jnp.float32)
    m0 = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    def obj_panel(p, X, m):
        ld, quad = kern_evidence_panel(kern, p, X, m)
        return ld + quad

    def obj_dense(p, X, m):
        K = kern.gram(p, X)
        L = jnp.linalg.cholesky(K)
        v = jax.scipy.linalg.solve_triangular(L, m, lower=True)
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(v * v)

    gp_p, gp_X, gp_m = jax.grad(obj_panel, argnums=(0, 1, 2))(p0, X0, m0)
    gd_p, gd_X, gd_m = jax.grad(obj_dense, argnums=(0, 1, 2))(p0, X0, m0)
    np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gd_p),
                               rtol=2e-2, atol=2e-2)
    # X/m gradients: elementwise values span orders of magnitude — compare
    # at the vector level (relative L2), the scale SCG actually consumes.
    # The Linv-from-bf16-L backward measures ~4e-2 here (Kinv compounds the
    # factor's bf16 rounding with condition number) — the documented drift
    # class of explicit-K⁻¹ backwards under the bf16 policy.
    for a, b in ((gp_X, gd_X), (gp_m, gd_m)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.linalg.norm(a - b) / np.linalg.norm(b) < 8e-2


def test_panel_engine_falls_back_outside_family():
    N, q = 300, 2
    rng = np.random.default_rng(8)
    kern = _cmpnd(q, "matern32", "white")
    p = jnp.asarray(np.array([1.0, 1.0, 0.2]), jnp.float64)
    X = jnp.asarray(rng.standard_normal((N, q)))
    m = jnp.asarray(rng.standard_normal((N, 1)))
    ld_ref, quad_ref = _dense_ref(kern, p, X, m)
    with pytest.warns(UserWarning, match="panel"):
        ld, quad = kern_evidence_panel(kern, p, X, m)
    assert abs(float(ld) - ld_ref) / abs(ld_ref) < 1e-5
    assert abs(float(quad) - quad_ref) / abs(quad_ref) < 1e-5


def test_panel_engine_falls_back_on_noiseless_kernel():
    """A kernel with no white component and no ridge is outside the panel
    domain (pad rows would factor as 0·I; the (Npad−N)·log noise correction
    is log 0) — it must degrade to lazy, not produce NaN/inf."""
    N, q = 300, 2
    rng = np.random.default_rng(11)
    kern = _cmpnd(q, "rbf", "bias")          # panel family, but noiseless
    p = jnp.asarray(np.array([1.0, 1.0, 0.3]), jnp.float64)
    X = jnp.asarray(rng.standard_normal((N, q)))
    m = jnp.asarray(rng.standard_normal((N, 1)))
    # a noiseless RBF gram is numerically singular (spectrum decays below
    # ε) — the correct degradation target is the dense jitchol-escalation
    # engine, whose rescue jitter defines the reference value here
    from gpc_tpu import linalg
    K = kern.gram(p, X)
    ld_ref, quad_ref, _ = linalg.evidence_terms(K, m)
    with pytest.warns(UserWarning, match="noise"):
        ld, quad = kern_evidence_panel(kern, p, X, m)
    assert np.isfinite(float(ld)) and np.isfinite(float(quad))
    assert abs(float(ld) - float(ld_ref)) < 1e-8 * max(1.0, abs(float(ld_ref)))
    assert abs(float(quad) - float(quad_ref)) < 1e-8 * max(1.0, abs(float(quad_ref)))
    # a ridge brings the same kernel back inside the domain (no fallback)
    import warnings as _w
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        ld2, quad2 = kern_evidence_panel(kern, p, X, m, ridge=0.1)
    assert not [w for w in caught if "falling back" in str(w.message)]
    assert np.isfinite(float(ld2)) and np.isfinite(float(quad2))


def test_gp_ftc_rides_panel_engine(monkeypatch):
    """GPC_TPU_EVIDENCE=panel routes models/gp.py FTC evidence through the
    panel engine — value AND value_and_grad work (gp learn trains)."""
    from gpc_tpu.models.gp import GP, make_objective
    monkeypatch.setenv("GPC_TPU_EVIDENCE", "panel")
    N, q = 260, 2
    rng = np.random.default_rng(9)
    # spread the inputs so the default kernel hyperparameters land inside
    # the engine's bf16 conditioning domain (clustered q=2 data at the
    # default inverseWidth has κ·ε_bf16 > 1 — the documented domain edge)
    X = (3.0 * rng.standard_normal((N, q))).astype(np.float32)
    y = np.sin(X[:, :1]).astype(np.float32)
    kern = _cmpnd(q, "rbf", "bias", "white")
    model = GP(kern, X, y, centre=True)
    nlml = make_objective(model.spec, X, y, model.bias, model.fixed_scales)
    th = jnp.asarray(model.theta, jnp.float32)
    v, g = jax.value_and_grad(nlml)(th)
    assert np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()
    monkeypatch.setenv("GPC_TPU_EVIDENCE", "dense")
    v_dense = float(nlml(jnp.asarray(model.theta)))
    assert abs(float(v) - v_dense) / abs(v_dense) < 1e-2
