"""GPC_TPU_EVIDENCE=panel: the Pallas panel mega-kernel as a MODEL engine.

Round-4 state: `ops/chol_panel.evidence_panel_rbf` — the fastest measured
N=16k evidence program on TPU (14.3-15.8 ms vs the best XLA schedule's
16.1-16.7, BASELINE.md round 4) — was reachable only from bench.py: it
handled exactly var·exp(−d²) + noise·I at N ≡ 0 (mod 4b).  This module
generalizes it to the CLI-default kernel family and routes it as a
first-class evidence engine for models/gp.py (FTC) and models/gplvm.py,
replacing the reference's dpotrf/dtrsv hot block
(/root/reference/CGp.cpp:913-937, CMatrix.cpp:371-412) for cmpnd
RBF(+bias)(+white) models:

  * rank-1 bias/white split — K = K₀ + c·𝟙𝟙ᵀ with K₀ = rbf + noise·I:
    the bias term's O(N) eigenvalue is exactly what pushes bf16 Schur
    corrections out of their stability region (ops/lazy_evidence.bias_split),
    so it is peeled off analytically: 𝟙 rides the panel kernel's forward
    solve as ONE extra RHS column, and the kernel's (D', D') RHS Gram
    G = vᵀv supplies every Sherman-Morrison ingredient from the same solve:
      logdet K = logdet K₀ + log(1 + c·s),        s  = G[-1,-1] = 𝟙ᵀK₀⁻¹𝟙
      mⱼᵀK⁻¹mⱼ = G[j,j] − c·G[j,-1]²/(1 + c·s)
  * ragged N — X/rhs are zero-padded to the kernel's 4b grid with the pad
    rows masked out of the Gram in-kernel (panel_state_rbf n_valid), so the
    pad block factors as √noise·I and contributes exactly
    (Npad − N)·log noise, subtracted analytically;
  * any input dim D, any number of outputs.

Training: the core is a jax.custom_vjp — forward is the (non-differentiable)
Pallas kernel; backward runs the analytic evidence cotangents from the
kernel's own residuals (L bf16 factor buffer + v = L⁻¹rhs):
  ∂logdet/∂K = K⁻¹ = L⁻ᵀL⁻¹ (blocked MXU inversion of L),
  ∂G/∂K = −α·Ḡ·αᵀ with α = K⁻¹rhs = L⁻ᵀv,   ∂G/∂rhs = 2·α·Ḡ,
then one jax.vjp of the dense masked Gram build maps K̄ → (X̄, θ̄) — the
same structure as the distributed analytic sweeps (CGp::updateCovGradient form,
/root/reference/CGp.cpp:666-679).  Cost note: this explicit-K⁻¹ backward is
the 625-ms-class route (BASELINE.md round 3) — `lazy` remains the TRAINING
throughput engine; `panel` is the forward-evidence champion (log-likelihood
evaluation, SCG objective-only probes, serving-side evidence monitoring).

Numerical domain: bf16 factor ⇒ value drift ~1e-4 relative vs f32-HIGH on
the bench conditioning (κ·ε_bf16 ≪ 1); gradients from the bf16 L drift at
the documented explicit-K⁻¹-bf16 level (~1e-2 relative).  Parity paths stay on
dense/lazy.
"""

from __future__ import annotations

import functools
import warnings

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from gpc_tpu.ops.chol_panel import CB, LEAF, panel_state_rbf


def panel_split(kern):
    """Parse the panel-servable kernel family out of `kern`.

    Accepts a bare Rbf or a top-level Cmpnd whose components are exactly:
    one Rbf, any number of Bias, and any number of White/WhiteFixed
    (the CLI composition convention — user kernel wrapped with bias+white,
    /root/reference/gp.cpp:346-349).  Returns
      (rbf_off, bias_offs, white_offs, fixed_white)
    — parameter-vector offsets such that inv_width = p[rbf_off],
    variance = p[rbf_off+1], c = Σ p[bias_offs], noise = Σ p[white_offs]
    + fixed_white — or None when the family doesn't apply (ARD scales,
    other leaves, nested compounds)."""
    from gpc_tpu.kernels import Cmpnd
    if getattr(kern, "kind", None) == "rbf":
        return 0, (), (), 0.0
    if not isinstance(kern, Cmpnd):
        return None
    off = kern.offsets()
    rbf_off = None
    bias_offs, white_offs = [], []
    fixed_white = 0.0
    for i, c in enumerate(kern.components):
        if c.kind == "rbf":
            if rbf_off is not None:
                return None     # two RBFs don't collapse to one panel Gram
            rbf_off = off[i]
        elif c.kind == "bias":
            bias_offs.append(off[i])
        elif c.kind == "white":
            white_offs.append(off[i])
        elif c.kind == "whitefixed":
            fixed_white += float(c.fixed_variance)
        else:
            return None
    if rbf_off is None:
        return None
    return rbf_off, tuple(bias_offs), tuple(white_offs), fixed_white


def _pick_block(n: int) -> int:
    """Panel block size: the measured TPU winner is b=512 (BASELINE.md); for
    small problems smaller blocks keep the 4b pad grid tight.  b must be a
    LEAF multiple."""
    if n > 4096:
        return 512
    if n > 1024:
        return 256
    return LEAF


@functools.lru_cache(maxsize=None)
def _panel_core_fn(b: int, npad: int, nv: int, interpret: bool):
    """custom_vjp'd (logdet₀, G) = f(X, rhs, iw, var, noise) over the PADDED
    problem, cached per geometry so the custom_vjp identity is stable
    across jit retraces."""

    def _mask_gram(K):
        if nv < npad:
            valid = jnp.arange(npad) < nv
            K = jnp.where(valid[:, None] & valid[None, :], K, 0.0)
        return K

    def _dense_k0(X, iw, var, noise):
        # the differentiable twin of the in-kernel masked Gram: pad rows
        # carry only the noise ridge, so pad cotangents (incl. the
        # (Npad−N)/noise logdet piece the caller subtracts) cancel exactly
        from gpc_tpu.linalg import dist2
        K = _mask_gram(var * jnp.exp(-0.5 * iw * dist2(X, X)))
        return K + noise * jnp.eye(npad, dtype=K.dtype)

    @jax.custom_vjp
    def core(X, rhs, iw, var, noise):
        # value-only path: the pure bench kernel (no diag-block residual
        # writes) — forward evidence pays nothing for trainability
        ld, G, _v, _T = panel_state_rbf(X, rhs, iw, var, noise, b=b,
                                        interpret=interpret, n_valid=nv)
        return ld, G

    def core_fwd(X, rhs, iw, var, noise):
        # grad path: mode "diag" stores L_jj⁻¹ into T's diagonal blocks —
        # the leaves never materialize L_jj, so the backward reconstructs
        # the full factor from (panels, leaf inverses)
        ld, G, v, T = panel_state_rbf(X, rhs, iw, var, noise, b=b,
                                      interpret=interpret, n_valid=nv,
                                      mode="full+diag")
        return (ld, G), (X, rhs, iw, var, noise, v, T)

    def core_bwd(res, cots):
        X, rhs, iw, var, noise, v, T = res
        g_ld, g_G = cots
        from gpc_tpu.linalg import blocked_tri_inv
        Tf = T.astype(jnp.float32)
        nblk = npad // b
        eye = jnp.broadcast_to(jnp.eye(b, dtype=jnp.float32), (nblk, b, b))
        Mds = jax.vmap(lambda i: lax.dynamic_slice(Tf, (i * b, i * b),
                                                   (b, b)))(jnp.arange(nblk))
        Ljj = jax.scipy.linalg.solve_triangular(Mds, eye, lower=True)
        L = Tf
        for i in range(nblk):                 # static scatter, nblk ≤ N/b
            L = lax.dynamic_update_slice(L, Ljj[i], (i * b, i * b))
        Linv = blocked_tri_inv(L)
        alpha = _mm(Linv, v, tA=True, tB=True)          # L⁻ᵀv = K₀⁻¹rhs (N, D')
        Kinv = _mm(Linv, Linv, tA=True)                 # L⁻ᵀ·L⁻¹
        Gs = 0.5 * (g_G + g_G.T)
        Kbar = g_ld * Kinv - _mm(_mm(alpha, Gs), alpha, tB=True)
        _, pullback = jax.vjp(_dense_k0, X.astype(jnp.float32), iw, var,
                              noise)
        Xb, iwb, varb, nb_ = pullback(Kbar)
        rhsb = 2.0 * _mm(alpha, Gs)
        return (Xb.astype(X.dtype), rhsb.astype(rhs.dtype),
                iwb.astype(jnp.asarray(iw).dtype),
                varb.astype(jnp.asarray(var).dtype),
                nb_.astype(jnp.asarray(noise).dtype))

    core.defvjp(core_fwd, core_bwd)
    return core


def _mm(a, bmat, tA=False, tB=False):
    dims = (((0,) if tA else (1,), (1,) if tB else (0,)), ((), ()))
    return lax.dot_general(a, bmat, dims, preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def kern_evidence_panel(kern, p, X, m, ridge=0.0):
    """(logdet, quad) for K = kern(X) + ridge·I through the panel
    mega-kernel — the GPC_TPU_EVIDENCE=panel engine.  Falls back to the
    lazy engine (with a visible warning) when the kernel family is outside
    the panel Gram's domain, when the kernel carries no white/noise ridge
    (the pad rows would be singular), or on GPU backends (the Mosaic
    kernel lowers on TPU; CPU runs interpret mode for tests): an explicit
    engine choice never silently computes a wrong thing, it degrades to
    the nearest correct engine."""
    info = panel_split(kern)
    fallback = None
    if info is None:
        fallback = (f"GPC_TPU_EVIDENCE=panel serves cmpnd(rbf[, bias][, "
                    f"white]) only (got "
                    f"{getattr(kern, 'kind', type(kern).__name__)})")
    elif not info[2] and info[3] + ridge <= 0.0:
        # no white component and no ridge: the pad rows would factor as
        # 0·I (singular) and the (Npad−N)·log noise correction is log 0 —
        # a noiseless K is outside the panel kernel's domain.  Such a K is
        # typically numerically singular too (RBF spectra decay below ε
        # fast), so degrade to the DENSE jitchol-escalation route — the
        # one engine built for non-PD rescue — not to lazy.
        warnings.warn("GPC_TPU_EVIDENCE=panel needs a white/noise ridge "
                      "(got a noiseless kernel); falling back to the dense "
                      "jitchol engine")
        from gpc_tpu import linalg
        K = kern.gram(jnp.asarray(p), jnp.asarray(X))
        if ridge:
            K = K + ridge * jnp.eye(K.shape[0], dtype=K.dtype)
        ld, quad, _L = linalg.evidence_terms(K, jnp.asarray(m))
        return ld, quad
    else:
        backend = jax.default_backend()
        if backend in ("gpu", "cuda", "rocm"):
            # the Mosaic kernel lowers on TPU only; CPU runs it in
            # interpret mode (slow — tests); GPUs degrade to lazy
            fallback = (f"GPC_TPU_EVIDENCE=panel runs on TPU (or CPU "
                        f"interpret mode); backend is {backend}")
    if fallback is not None:
        warnings.warn(fallback + "; falling back to the lazy engine")
        from gpc_tpu.ops.lazy_evidence import kern_evidence_lazy
        return kern_evidence_lazy(kern, p, X, m, ridge=ridge, force=True)
    rbf_off, bias_offs, white_offs, fixed_white = info
    p = jnp.asarray(p)
    X = jnp.asarray(X)
    m = jnp.asarray(m)
    iw = p[rbf_off]
    var = p[rbf_off + 1]
    noise = sum((p[o] for o in white_offs),
                jnp.asarray(fixed_white + ridge, p.dtype))
    n, q = X.shape
    D = m.shape[1]
    b = _pick_block(n)
    npad = -(-n // (CB * b)) * (CB * b)
    interpret = jax.default_backend() == "cpu"

    Xp = jnp.pad(X, ((0, npad - n), (0, 0)))
    cols = [m]
    if bias_offs:
        cols.append(jnp.ones((n, 1), m.dtype))
    rhs = jnp.pad(jnp.concatenate(cols, axis=1), ((0, npad - n), (0, 0)))
    core = _panel_core_fn(b, npad, n, interpret)
    ld0, G = core(Xp, rhs, iw, var, noise)
    ld0 = ld0 - (npad - n) * jnp.log(noise)
    if not bias_offs:
        return ld0, jnp.trace(G)
    c = sum((p[o] for o in bias_offs), jnp.zeros((), p.dtype))
    s = G[-1, -1]
    u = G[:-1, -1]
    qm = jnp.sum(jnp.diagonal(G)[:-1])
    denom = 1.0 + c * s
    return ld0 + jnp.log(denom), qm - c * jnp.sum(u * u) / denom
