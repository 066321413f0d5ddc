"""Evidence-engine selection: the ONE resolution point for GPC_TPU_EVIDENCE.

Round-5 state (VERDICT r4 ask #8 — engine-surface pruning): the framework
ships FOUR documented evidence engines, each with one job:

  dense     — jitchol escalation (linalg.py), f64-capable: the PARITY route
              and the universal default up to DENSE_SAFE_N.
  lazy      — Gram tiles fused into the blocked factorization
              (ops/lazy_evidence + ops/evidence_fast), differentiable via
              plain autodiff: the measured TRAINING fast path
              (GPLVM-16k 141 ms/step) and the default past DENSE_SAFE_N on
              TPU when N splits.
  panel     — the Pallas panel mega-kernel as a product engine
              (ops/panel_engine): the measured FORWARD-evidence fast path
              (bench winner), trainable through an analytic custom VJP at
              explicit-K⁻¹ cost.
  iterative — matrix-free CG + SLQ (ops/iterative): O(N·block) memory, the
              N ≫ dense-HBM story (65k one chip; parallel/dist_iterative
              multiplies by the mesh).  Stochastic logdet — opt-in only.

The round-2..4 `fastgrad` engine (bf16 fused forward + explicit-K⁻¹ custom
VJP) was REMOVED in round 5: it lost to lazy for training (625 vs 141
ms/step, BASELINE.md round 3) and its one remaining justification —
pairing a non-differentiable forward with analytic reverse sweeps — is
exactly what ops/panel_engine now does with a faster forward.
"""

from __future__ import annotations


def evidence_base() -> int:
    """The effective lazy-evidence base block (GPC_TPU_EVIDENCE_BASE
    override, else ops.chol_blocked.BASE) — the models' shape guards and
    the engines must agree on this so the documented fall-back-with-warning
    contract holds for every base."""
    import os

    from gpc_tpu.ops.chol_blocked import BASE
    return int(os.environ.get("GPC_TPU_EVIDENCE_BASE", BASE))


def evidence_splits(n: int) -> bool:
    """Whether the lazy engine accepts size n at the effective base (its
    shape requirement)."""
    b = evidence_base()
    return n % b == 0 and n > 2 * b


def evidence_mode(default: str = "dense") -> str:
    """Explicit engine selection — GPC_TPU_EVIDENCE = dense | lazy | panel |
    iterative (see module docstring).  Callers should resolve through
    `select_evidence_mode(n)`, which handles the shape fallback and the
    backend-aware default."""
    import os
    v = os.environ.get("GPC_TPU_EVIDENCE", default).lower()
    if v not in ("dense", "lazy", "iterative", "panel"):
        raise ValueError(
            f"GPC_TPU_EVIDENCE={v!r} (want dense|lazy|panel|iterative)")
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
    with a visible warning + dense fallback when the lazy engine's shape
    requirement (n splits into `evidence_base()` blocks) is unmet.  When
    the flag is UNSET the default is `dense` everywhere up to DENSE_SAFE_N;
    only past that, on a non-CPU backend with a splitting n, does it
    default to `lazy`.  Note lazy's failure semantics differ: transiently
    non-PD K yields a NaN objective (SCG step rejection) instead of dense's
    jitter re-escalation.  `iterative`/`panel` have no split requirement
    and are never auto-selected — opt-in only (stochastic logdet /
    forward-optimized engine respectively)."""
    import os
    import warnings

    explicit = os.environ.get("GPC_TPU_EVIDENCE")
    mode = evidence_mode()
    if mode == "lazy" and not evidence_splits(n):
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
