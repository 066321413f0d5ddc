"""Custom-VJP fast evidence (ops/evidence_grad): gradients ≡ dense autodiff.

The forward is the evidence_fast fused factorization; the backward is the
closed-form cotangent (K⁻¹, −ααᵀ, 2α — CGp::updateCovGradient form,
/root/reference/CGp.cpp:666-679) pulled through jax.vjp of the dense Gram
build.  These tests pin:
  * f64/exact-policy value+grad identity with the dense jitchol route,
  * the bf16 policy's documented gradient drift bound,
  * the GPLVM/GP evidence-mode flag wiring (GPC_TPU_EVIDENCE — explicit
    flag, no shape-keyed fork),
  * NaN-objective SCG step rejection on a singular K (the lazy paths'
    replacement for jitter escalation).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu import linalg
from gpc_tpu.ops.evidence_fast import Policy
from gpc_tpu.ops.evidence_grad import kern_evidence_grad


def _mk(n=768, q=3, D=2, dtype=np.float64, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, q)).astype(dtype)
    m = rng.standard_normal((n, D)).astype(dtype)
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
    p = jnp.asarray(kern.default_params().astype(dtype))
    return kern, p, jnp.asarray(X), jnp.asarray(m)


def _dense_obj(kern, p, X, m, c_ld, c_q):
    Kd = kern.compute(p, X, X) + kern.white(p) * jnp.eye(X.shape[0],
                                                         dtype=X.dtype)
    L = jnp.linalg.cholesky(Kd)
    v = jax.scipy.linalg.solve_triangular(L, m, lower=True)
    return (c_ld * 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            + c_q * jnp.sum(v * v))


def test_value_and_grad_f64_exact():
    kern, p, X, m = _mk()
    pol = Policy(base=256, bf16=False, leafinv="xla", stack=True)
    c_ld, c_q = 0.7, 1.3  # distinct cotangents exercise both VJP branches

    def fast_obj(p, X, m):
        ld, q = kern_evidence_grad(kern, p, X, m, pol=pol)
        return c_ld * ld + c_q * q

    v_fast, g_fast = jax.value_and_grad(fast_obj, argnums=(0, 1, 2))(p, X, m)
    v_ref, g_ref = jax.value_and_grad(_dense_obj, argnums=(1, 2, 3))(
        kern, p, X, m, c_ld, c_q)
    assert abs(float(v_fast) - float(v_ref)) < 1e-8 * abs(float(v_ref))
    for a, b, name in zip(g_fast, g_ref, ("p", "X", "m")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9, err_msg=name)


def test_grad_bf16_policy_drift():
    """bf16 Schur updates: gradient within ~1e-2 relative of the exact route
    (the documented mixed-precision domain — speed runs, never parity).

    Uses the bench problem family (RBF + noise ridge at SNR 10): bf16's
    stability region excludes kernels with large near-rank-1 components
    (e.g. an O(1) bias variance at large N), see kern_evidence_grad note."""
    rng = np.random.default_rng(1)
    q, D = 3, 2
    X = jnp.asarray(rng.standard_normal((768, q)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((768, D)), jnp.float32)
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.White(input_dim=q)))
    p = jnp.asarray([1.0, 1.0, 0.1], jnp.float32)  # iw, var, noise
    pol = Policy(base=256, bf16=True, leafinv="xla", stack=True)

    def fast_obj(p):
        ld, q = kern_evidence_grad(kern, p, X, m, pol=pol)
        return ld + q

    g_fast = np.asarray(jax.grad(fast_obj)(p))
    g_ref = np.asarray(jax.grad(
        lambda p: _dense_obj(kern, p, X.astype(jnp.float64),
                             m.astype(jnp.float64), 1.0, 1.0))(
        p.astype(jnp.float64)))
    denom = np.maximum(np.abs(g_ref), 1e-3 * np.abs(g_ref).max())
    # measured ~2.1e-2 max relative drift on this family (the certified
    # bound quoted in ops/evidence_grad.py's module docstring)
    assert np.max(np.abs(g_fast - g_ref) / denom) < 3e-2


def test_gplvm_evidence_mode_flag(monkeypatch):
    """GPC_TPU_EVIDENCE=fastgrad: GPLVM NLML value+grad ≡ the dense default
    (f64 exact policy on CPU) — and the path is flag-selected, not
    shape-selected."""
    from gpc_tpu.models.gplvm import GPLVM

    rng = np.random.default_rng(2)
    y = rng.standard_normal((768, 4))
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    model = GPLVM(kern, y, latent_dim=2)
    obj = model._make_objective()
    v_dense, g_dense = jax.value_and_grad(obj)(model.theta)

    monkeypatch.setenv("GPC_TPU_EVIDENCE", "fastgrad")
    v_fast, g_fast = jax.value_and_grad(obj)(model.theta)
    assert abs(float(v_fast) - float(v_dense)) < 1e-8 * abs(float(v_dense))
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_dense),
                               rtol=1e-6, atol=1e-8)

    # non-splitting N falls back to dense with a VISIBLE warning, not silently
    y_odd = rng.standard_normal((100, 4))
    model_odd = GPLVM(kern, y_odd, latent_dim=2)
    with pytest.warns(UserWarning, match="falling back"):
        jax.value_and_grad(model_odd._make_objective())(model_odd.theta)


def test_gp_ftc_evidence_mode_flag(monkeypatch):
    """Same flag on the GP FTC hot block (models/gp.py)."""
    from gpc_tpu.models.gp import GP

    rng = np.random.default_rng(3)
    X = rng.standard_normal((768, 2))
    y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((768, 1))
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    model = GP(kern, X, y, centre=True)
    obj = model._objective
    v_dense, g_dense = jax.value_and_grad(obj)(model.theta)
    monkeypatch.setenv("GPC_TPU_EVIDENCE", "fastgrad")
    v_fast, g_fast = jax.value_and_grad(obj)(model.theta)
    assert abs(float(v_fast) - float(v_dense)) < 1e-7 * abs(float(v_dense))
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-7)


def test_gplvm_lazy_mode_flag(monkeypatch):
    """GPC_TPU_EVIDENCE=lazy (the recommended TPU training route): GPLVM
    NLML value+grad ≡ dense at f64 — through the bias-split fast path."""
    from gpc_tpu.models.gplvm import GPLVM

    rng = np.random.default_rng(6)
    y = rng.standard_normal((768, 3))
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2)))
    model = GPLVM(kern, y, latent_dim=2)
    obj = model._make_objective()
    v_dense, g_dense = jax.value_and_grad(obj)(model.theta)
    monkeypatch.setenv("GPC_TPU_EVIDENCE", "lazy")
    v_lazy, g_lazy = jax.value_and_grad(obj)(model.theta)
    assert abs(float(v_lazy) - float(v_dense)) < 1e-8 * abs(float(v_dense))
    np.testing.assert_allclose(np.asarray(g_lazy), np.asarray(g_dense),
                               rtol=1e-6, atol=1e-8)


def test_nan_objective_scg_rescue():
    """Singular K (duplicate inputs, white → 0) must yield a NaN evidence —
    not a crash — and SCG must reject the NaN step and return finite params
    (optim/scg.py NaN handling; replaces jitter escalation on lazy paths)."""
    from gpc_tpu.optim.scg import scg

    rng = np.random.default_rng(4)
    q = 2
    Xb = rng.standard_normal((384, q))
    X = jnp.asarray(np.concatenate([Xb, Xb], axis=0))   # duplicated rows
    m = jnp.asarray(rng.standard_normal((768, 1)))
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.White(input_dim=q)))
    pol = Policy(base=256, bf16=False, leafinv="xla", stack=True)
    base_p = kern.default_params()

    def obj(a):
        # a = log white variance; duplicates make K exactly singular at
        # white → 0, so sufficiently negative steps produce NaN
        p = jnp.asarray(base_p).at[-1].set(jnp.exp(a[0]))
        ld, qd = kern_evidence_grad(kern, p, X, m, pol=pol)
        return ld + qd

    vag = jax.value_and_grad(obj)
    v_bad, _ = vag(jnp.asarray([-80.0]))
    assert not np.isfinite(float(v_bad))

    res = scg(vag, jnp.asarray([0.0]), max_iters=25)
    assert np.all(np.isfinite(np.asarray(res.x)))
    assert np.isfinite(float(res.obj))
    v0 = float(obj(jnp.asarray([0.0])))
    assert float(res.obj) <= v0 + 1e-9
