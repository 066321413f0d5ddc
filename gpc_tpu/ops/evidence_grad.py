"""Custom-VJP fast evidence: bf16 fused forward + analytic reverse sweeps.

Round-2 state: the mixed-precision fused evidence (ops/evidence_fast.py) was
forward-only, so TPU *training* (SCG value_and_grad — the reference's entire
hot block, /root/reference/CGp.cpp:913-1014 driven by COptimisable.cpp:246-396)
never benefited; GP-LVM-16k steps ran the f32-HIGH autodiff route.  This module
closes that gap: `(logdet K, Σⱼ mⱼᵀK⁻¹mⱼ)` as a `jax.custom_vjp` whose

  forward  = the evidence_fast left-looking fused factorization (bf16-input/
             f32-accum Schur GEMMs, leaf inverses, lazy Gram tiles), keeping
             the factor tree + forward-solve v as residuals;
  backward = the closed-form evidence cotangents (the same three reverse
             panel sweeps the distributed path uses,
             parallel/chol_distributed.py:151-193; CGp::updateCovGradient
             form, /root/reference/CGp.cpp:666-679):
               ∂logdet/∂K = K⁻¹,   ∂quad/∂K = −α·αᵀ,   ∂quad/∂m = 2α,
             with α = L⁻ᵀv solved against the tree, K⁻¹ = L⁻ᵀ·L⁻¹ from a
             blocked MXU triangular inverse of the tree, and the kernel/input
             pullback K̄ → (θ̄, X̄) delegated to jax.vjp of the dense Gram
             build (one O(N²·q) backward, never hand-derived covGrad algebra).

Because the VJP is custom, the forward may use non-differentiable pieces
(Pallas leaf kernels, bf16 casts) freely — autodiff never traces it.

Numerical domain: same as evidence_fast — under the bf16 policy gradients
match the exact route to ~2e-2 max relative (measured on the bench problem
family, tests/test_evidence_grad.py::test_grad_bf16_policy_drift); with bf16
off the f64 gradients are exact to 1e-7 relative.  Parity paths keep the
dense jitchol route.

Performance note (measured, BASELINE.md round-3 extras): on the GPLVM-16k
workload plain jax.grad through the lazy recursion (GPC_TPU_EVIDENCE=lazy,
141 ms/step) BEATS this explicit-K⁻¹ backward (625 ms at f32-HIGH) — the
Linvᵀ·Linv product alone costs ~6× the Cholesky's flops, where autodiff's
transposed-solve backward is ~2×.  Use `lazy` for training throughput;
`fastgrad` earns its keep when the forward must contain non-differentiable
pieces (Pallas leaf kernels) or when residual memory from autodiff is the
binding constraint (this VJP retains only the factor tree + v).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from gpc_tpu.ops.evidence_fast import Policy, _chol_left, _mmp
from gpc_tpu.ops.lazy_evidence import kern_block_fn


def _mmT(a, b, *, bf16):
    """aᵀ @ b (contract dim 0) with optional bf16-input/f32-accum policy."""
    dims = (((0,), (0,)), ((), ()))
    if bf16:
        return lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                               dims, preferred_element_type=jnp.float32)
    prec = (lax.Precision.HIGH if a.dtype == jnp.float32
            else lax.Precision.HIGHEST)
    return lax.dot_general(a, b, dims, preferred_element_type=a.dtype,
                           precision=prec)


def _untag(tree):
    """Strip the "leaf"/"node" string tags so the factor tree is a pure-array
    pytree (strings can't ride custom_vjp residuals).  Leaf → (L, M|None),
    node → (left, L21, right); the two are distinguished structurally
    (a node's first element is a tuple, a leaf's is an array)."""
    if tree[0] == "leaf":
        return (tree[1], tree[2])
    return (_untag(tree[1]), tree[2], _untag(tree[3]))


def _is_node(t):
    return len(t) == 3 and isinstance(t[0], tuple)


def _solve_lt(tree, v, pol: Policy):
    """Solve Lᵀ·x = v against an (untagged) factor tree.

    The α = K⁻¹m backward sweep (CGp::updateAlpha's second trsm,
    /root/reference/CGp.cpp:469-534).  Always f32/f64 GEMMs (O(N²·D) — cheap
    relative to the O(N³) sweeps, and α accuracy feeds every gradient)."""
    if not _is_node(tree):
        L, M = tree
        if M is not None:
            return _mmT(M.astype(v.dtype), v, bf16=False)
        return solve_triangular(L, v, lower=True, trans=1)
    left, L21, right = tree
    h = L21.shape[1]
    x2 = _solve_lt(right, v[h:], pol)
    x1 = _solve_lt(left, v[:h] - _mmT(L21.astype(v.dtype), x2, bf16=False),
                   pol)
    return jnp.concatenate([x1, x2], axis=0)


def _tree_linv(tree, pol: Policy):
    """Dense L⁻¹ (lower triangular) from the factor tree, all MXU GEMMs:
      inv([[L11, 0], [L21, L22]]) = [[L11⁻¹, 0], [−L22⁻¹·L21·L11⁻¹, L22⁻¹]].
    Runs under the same bf16 policy as the forward's O(N³) work."""
    if not _is_node(tree):
        L, M = tree
        if M is not None:
            return M
        return solve_triangular(
            L, jnp.eye(L.shape[0], dtype=L.dtype), lower=True)
    left, L21, right = tree
    I1 = _tree_linv(left, pol)
    I2 = _tree_linv(right, pol)
    B = -_mmp(I2, _mmp(L21, I1, bf16=pol.bf16), bf16=pol.bf16)
    h = I1.shape[0]
    nh = I2.shape[0]
    top = jnp.concatenate([I1, jnp.zeros((h, nh), I1.dtype)], axis=1)
    bot = jnp.concatenate([B.astype(I1.dtype), I2], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@functools.lru_cache(maxsize=None)
def _evidence_vjp_fn(kern, n: int, ridge: float, pol: Policy):
    """custom_vjp'd (logdet, quad) = f(p, X, m), cached per (kernel, policy)
    so the custom_vjp identity is stable across jit retraces."""

    def _dense_K(p, X):
        # the dense equivalent of kern_block_fn's lazy blocks: compute() plus
        # the white-variance/ridge shift on the diagonal (the gram() diagonal
        # discipline — kern_block_fn invariant, tests/test_lazy_evidence.py)
        return (kern.compute(p, X, X)
                + (kern.white(p) + ridge) * jnp.eye(n, dtype=X.dtype))

    def _forward(p, X, m):
        kfn = kern_block_fn(kern, p, X, ridge)
        tree, v, logdiag = _chol_left(kfn, n, m, (), pol)
        return (2.0 * logdiag, jnp.sum(v * v)), (_untag(tree), v, p, X)

    @jax.custom_vjp
    def evidence(p, X, m):
        (logdet, quad), _ = _forward(p, X, m)
        return logdet, quad

    def evidence_fwd(p, X, m):
        return _forward(p, X, m)

    def evidence_bwd(res, cots):
        tree, v, p, X = res
        g_ld, g_quad = cots
        alpha = _solve_lt(tree, v, pol)                    # K⁻¹m, f32 sweeps
        Linv = _tree_linv(tree, pol)
        Kinv = _mmT(Linv, Linv, bf16=pol.bf16)             # L⁻ᵀ·L⁻¹
        aaT = lax.dot_general(alpha, alpha, (((1,), (1,)), ((), ())),
                              preferred_element_type=alpha.dtype,
                              precision=lax.Precision.HIGHEST)
        Kbar = g_ld * Kinv.astype(alpha.dtype) - g_quad * aaT
        Kbar = 0.5 * (Kbar + Kbar.T)                        # symmetrize bf16 noise
        _, pullback = jax.vjp(_dense_K, p, X)
        pbar, Xbar = pullback(Kbar.astype(X.dtype))
        mbar = 2.0 * g_quad * alpha
        return pbar, Xbar, mbar

    evidence.defvjp(evidence_fwd, evidence_bwd)
    return evidence


def evidence_base() -> int:
    """The effective lazy-evidence base block (GPC_TPU_EVIDENCE_BASE
    override, else ops.chol_blocked.BASE) — the models' shape guards and
    the engines must agree on this so the documented fall-back-with-warning
    contract holds for every base."""
    import os

    from gpc_tpu.ops.chol_blocked import BASE
    return int(os.environ.get("GPC_TPU_EVIDENCE_BASE", BASE))


def evidence_splits(n: int) -> bool:
    """Whether the lazy/fastgrad engines accept size n at the effective
    base (their shared shape requirement)."""
    b = evidence_base()
    return n % b == 0 and n > 2 * b


def evidence_mode(default: str = "dense") -> str:
    """Explicit evidence-path selection — GPC_TPU_EVIDENCE = dense | lazy |
    panel | iterative (+ legacy fastgrad).  `dense` (default): jitchol
    escalation, the parity route.  `lazy`: f32-HIGH fused lazy factorization
    (differentiable via autodiff) — the measured TRAINING fast path.
    `panel`: the Pallas panel mega-kernel (ops/panel_engine.py) — the
    measured FORWARD-evidence fast path (bf16 factor; analytic custom-VJP
    backward at explicit-K⁻¹ cost).  `iterative`: matrix-free CG quad + SLQ
    logdet (ops/iterative.py) — never materializes K, trains past dense-HBM
    N.  `fastgrad`: bf16 fused forward + this module's custom VJP (kept for
    non-differentiable-forward experiments; loses to lazy for training).
    Callers should resolve the engine through `select_evidence_mode(n)`,
    which handles the shape fallback and the backend-aware default."""
    import os
    v = os.environ.get("GPC_TPU_EVIDENCE", default).lower()
    if v not in ("dense", "lazy", "fastgrad", "iterative", "panel"):
        raise ValueError(
            f"GPC_TPU_EVIDENCE={v!r} "
            f"(want dense|lazy|panel|iterative|fastgrad)")
    return v


# Largest N where the dense route's single N-wide triangular solve is known
# safe on the TPU compile helper (it crashes at N≳16k — CLAUDE.md round 3).
# Below this, `dense` is the UNIVERSAL unset-flag default on every backend —
# N=4096 and N=4100 run the same engine out of the box; the backend-aware
# auto-`lazy` kicks in only past it, where dense is not a viable default.
DENSE_SAFE_N = 8192


def select_evidence_mode(n: int) -> str:
    """Resolve the evidence engine for problem size n (models/gp.py FTC and
    models/gplvm.py call this).  An explicit GPC_TPU_EVIDENCE always wins —
    with a visible warning + dense fallback when the fused engines' shape
    requirement (n splits into `evidence_base()` blocks) is unmet.  When the
    flag is UNSET the default is `dense` (jitchol-escalation parity route)
    everywhere up to DENSE_SAFE_N; only past that, on a non-CPU backend with
    a splitting n, does it default to `lazy` (the dense route's N-wide
    triangular solve crashes the TPU compile helper at N≳16k, and lazy is
    the measured training fast path — BASELINE.md round 3).  Note lazy's
    failure semantics differ: transiently non-PD K yields a NaN objective
    (SCG step rejection) instead of dense's jitter re-escalation.
    `iterative`/`panel` have no split requirement and are never
    auto-selected — opt-in only (stochastic logdet / forward-optimized
    engine respectively)."""
    import os
    import warnings

    explicit = os.environ.get("GPC_TPU_EVIDENCE")
    mode = evidence_mode()
    if mode in ("lazy", "fastgrad") and not evidence_splits(n):
        if explicit:
            warnings.warn(
                f"GPC_TPU_EVIDENCE={mode} needs n_data to split into "
                f"{evidence_base()} blocks (got N={n}); falling back to "
                f"dense")
        return "dense"
    if explicit is None and mode == "dense":
        import jax as _jax
        if (n > DENSE_SAFE_N and _jax.default_backend() != "cpu"
                and evidence_splits(n)):
            return "lazy"
    return mode


def kern_evidence_grad(kern, p, X, m, ridge: float = 0.0,
                       pol: Policy | None = None):
    """(logdet, quad) for K = kern(X) + ridge·I — fast fused forward AND a
    custom analytic VJP, so `jax.grad` of an NLML built on this runs the
    entire training step at the bench pipeline's mixed-precision speed.

    Drop-in for `kern_evidence_lazy` on training paths (models/gp.py /
    models/gplvm.py, GPC_TPU_EVIDENCE=fastgrad).  n must split cleanly
    (n % pol.base == 0, n > 2·base); callers fall back to the dense route
    otherwise.  Default policy: f32-HIGH GEMMs (the custom VJP alone is the
    win — no autodiff residual chain); GPC_TPU_BF16_EVIDENCE=1 opts the
    O(N³) sweeps into bf16-input/f32-accum for f32 inputs.  bf16 is only
    stable when the factorization is well conditioned relative to bf16
    rounding (e.g. the bench problem's noise ridge at SNR 10) — a kernel
    with a large near-rank-1 component (an O(1) bias variance at large N)
    cancels catastrophically in the Schur corrections and goes NaN, which
    SCG then rejects every step.  Same opt-in semantics as
    kern_evidence_lazy."""
    import os

    X = jnp.asarray(X)
    n = X.shape[0]
    if pol is None:
        bf16 = (X.dtype == jnp.float32
                and os.environ.get("GPC_TPU_BF16_EVIDENCE", "0") == "1")
        pol = Policy(base=evidence_base(), bf16=bf16, leafinv="xla",
                     stack=True)
    assert n % pol.base == 0 and n > 2 * pol.base, (
        "kern_evidence_grad needs n to split cleanly; pad or use the dense "
        "path")
    return _evidence_vjp_fn(kern, n, float(ridge), pol)(p, X, jnp.asarray(m))
