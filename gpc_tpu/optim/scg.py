"""Møller's Scaled Conjugate Gradient — the reference's default trainer.

Faithful re-implementation of COptimisable::scgOptimise (reference
COptimisable.cpp:246-396) as a single jitted `lax.while_loop`, so the entire
optimization — including every objective/gradient evaluation — stays on-device.
Replicated verbatim (for learned-hyperparameter parity):

  * curvature probe σ = 1e-4/‖p‖ and finite-difference Hessian-vector product
    s = (∇f(w+σp) − ∇f(w))/σ                    (COptimisable.cpp:302-315)
  * the scale update δ += (λ−λ̄)·‖p‖  — the reference uses ‖p‖ here, NOT ‖p‖²
    as Møller's paper does                       (COptimisable.cpp:318-320)
  * PD repair, step α = μ/δ, comparison Δ, λ halving at Δ≥0.75 (floored at
    1e-15) and ×4 growth at Δ<0.25              (COptimisable.cpp:322-380)
  * restart p ← r every nParams iterations       (COptimisable.cpp:353-355)
  * convergence on a successful step when |max(p)·α| < paramTol; the objective
    condition is trivially met because oldObj has just been assigned newObj
    (COptimisable.cpp:385-393)

Deviation: a NaN/Inf objective (e.g. Cholesky failure surfaced as NaN, see
linalg.jitchol) maps Δ to −∞ so the step is rejected and λ grows — the
equivalent of the reference's exception-driven step rejection.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class ScgResult(NamedTuple):
    x: jax.Array          # optimized parameter vector
    obj: jax.Array        # final objective value
    iters: jax.Array      # iterations executed
    converged: jax.Array  # True if tolerance met before max_iters


class _State(NamedTuple):
    w: jax.Array
    r: jax.Array        # negative gradient at w
    p: jax.Array        # search direction
    s: jax.Array        # curvature probe vector (persists across failed steps)
    delta: jax.Array    # pᵀHp estimate (persists across failed steps)
    old_obj: jax.Array
    lam: jax.Array
    lam_bar: jax.Array
    success: jax.Array
    iter: jax.Array
    converged: jax.Array


def scg(value_and_grad_fn: Callable, x0, max_iters: int = 1000,
        param_tol: float = 1e-6, obj_tol: float = 1e-6, args=(),
        aot_key=None) -> ScgResult:
    """Minimize value_and_grad_fn (returning (obj, grad)) starting at x0.

    Defaults mirror COptimisable.h:29-36 (1000 iters, tolerances 1e-6).
    obj_tol is accepted for signature parity; see module docstring on why the
    reference's objective test is vacuous.

    `args` are extra arrays passed through as value_and_grad_fn(x, *args).
    Pass per-call data (e.g. the IVM's re-selected active set) here rather
    than capturing it in a closure: closure captures become embedded
    constants, forcing a full while_loop recompile on every call, while args
    are traced — one compile per (fn identity, shapes).

    `aot_key` is accepted and ignored: a jax.export-based warm-start trace
    skip was built and removed in round 2 — executing a DESERIALIZED exported
    program cross-process segfaults in this image's XLA:CPU build (inside the
    compiled call, with or without the persistent compilation cache), so the
    ~0.7 s trace+lower on warm runs is currently irreducible.
    """
    return _scg_run(value_and_grad_fn, jnp.asarray(x0),
                    tuple(jnp.asarray(a) for a in args),
                    int(max_iters), float(param_tol))


def _scg_init(value_and_grad_fn, x0, args) -> _State:
    dt = x0.dtype
    obj0, g0 = value_and_grad_fn(x0, *args)
    r0 = -g0
    return _State(
        w=x0, r=r0, p=r0, s=jnp.zeros_like(x0),
        delta=jnp.ones((), dt), old_obj=obj0,
        lam=jnp.ones((), dt), lam_bar=jnp.zeros((), dt),
        success=jnp.array(True), iter=jnp.array(0),
        converged=jnp.array(False),
    )


def _make_body(value_and_grad_fn, args, n_params, param_tol, dt):
    """The SCG iteration body, shared by the monolithic run and the
    checkpoint-segmented run so both execute the IDENTICAL trajectory."""

    def body(st: _State):
        it = st.iter + 1  # 1-based like the reference
        normp2 = jnp.sum(st.p * st.p)
        normp = jnp.sqrt(normp2)

        def probe(_):
            sigma = 1e-4 / normp
            _, g_plus = value_and_grad_fn(st.w + sigma * st.p, *args)
            s = (g_plus + st.r) / sigma  # (∇f(w+σp) − ∇f(w))/σ since r = −∇f(w)
            return s, jnp.sum(s * st.p)

        s, delta = lax.cond(st.success, probe, lambda _: (st.s, st.delta), None)

        lam_diff = st.lam - st.lam_bar
        s = s + lam_diff * st.p
        delta = delta + lam_diff * normp  # sic: ‖p‖, reference COptimisable.cpp:320

        # PD repair (step 4)
        def repair(vals):
            s, delta, lam, lam_bar = vals
            d_over = delta / normp2
            s = s + (lam - 2.0 * d_over) * st.p
            lam_bar = 2.0 * (lam - d_over)
            delta = lam * normp2 - delta
            return s, delta, lam_bar, lam_bar  # lam ← lam_bar
        s, delta, lam_bar, lam = lax.cond(
            delta <= 0.0, repair, lambda a: (a[0], a[1], a[3], a[2]),
            (s, delta, st.lam, st.lam_bar))

        mu = jnp.sum(st.p * st.r)
        alpha = mu / delta

        w_try = st.w + alpha * st.p
        # One fused fwd+bwd here: the reference evaluates objective-only at step 6
        # (COptimisable.cpp:341) and re-evaluates the gradient at step 7 on
        # success; since successful steps dominate, computing value_and_grad once
        # and reusing the gradient in the success branch is strictly cheaper.
        new_obj, g_try = value_and_grad_fn(w_try, *args)
        Delta = 2.0 * delta * (st.old_obj - new_obj) / (mu * mu)
        Delta = jnp.where(jnp.isfinite(Delta), Delta, -jnp.inf)

        def on_success(_):
            rp = -g_try
            def restart(_):
                return rp
            def polak(_):
                beta = (jnp.sum(rp * rp) - jnp.sum(st.r * rp)) / mu
                return beta * st.p + rp
            p_new = lax.cond(it % n_params == 0, restart, polak, None)
            lam_new = jnp.where(Delta >= 0.75, jnp.maximum(lam * 0.5, 1e-15), lam)
            return (w_try, rp, p_new, new_obj, lam_new,
                    jnp.zeros((), dt), jnp.array(True))

        def on_failure(_):
            return (st.w, st.r, st.p, st.old_obj, lam, lam, jnp.array(False))

        w_n, r_n, p_n, obj_n, lam_n, lam_bar_n, success_n = lax.cond(
            Delta >= 0.0, on_success, on_failure, None)

        lam_n = jnp.where(Delta < 0.25, lam_n * 4.0, lam_n)

        converged = jnp.logical_and(
            success_n, jnp.abs(jnp.max(p_n) * alpha) < param_tol)

        return _State(w=w_n, r=r_n, p=p_n, s=s, delta=delta, old_obj=obj_n,
                      lam=lam_n, lam_bar=lam_bar_n, success=success_n,
                      iter=it, converged=converged)

    return body


@functools.partial(jax.jit,
                   static_argnames=("value_and_grad_fn", "max_iters",
                                    "param_tol"))
def _scg_run(value_and_grad_fn, x0, args, max_iters, param_tol) -> ScgResult:
    init = _scg_init(value_and_grad_fn, x0, args)
    body = _make_body(value_and_grad_fn, args, x0.shape[0], param_tol,
                      x0.dtype)

    def cond(st: _State):
        return jnp.logical_and(st.iter < max_iters, ~st.converged)

    final = lax.while_loop(cond, body, init)
    return ScgResult(x=final.w, obj=final.old_obj, iters=final.iter,
                     converged=final.converged)


@functools.partial(jax.jit,
                   static_argnames=("value_and_grad_fn", "param_tol"))
def _scg_segment(value_and_grad_fn, state: _State, args, iter_end,
                 param_tol) -> _State:
    """Advance SCG from `state` until iter == iter_end (traced, so every
    segment length reuses ONE compiled program) or convergence."""
    body = _make_body(value_and_grad_fn, args, state.w.shape[0], param_tol,
                      state.w.dtype)

    def cond(st: _State):
        return jnp.logical_and(st.iter < iter_end, ~st.converged)

    return lax.while_loop(cond, body, state)


def scg_checkpointed(value_and_grad_fn: Callable, x0, max_iters: int = 1000,
                     param_tol: float = 1e-6, obj_tol: float = 1e-6,
                     args=(), ckpt_every: int = 50, on_checkpoint=None,
                     resume_state=None) -> ScgResult:
    """scg() with preemption protection: the SAME init and iteration body,
    executed in `ckpt_every`-iteration jitted segments with the FULL
    optimizer state surfaced to `on_checkpoint(step, state_dict)` between
    segments — so a killed run resumes (pass the saved dict back as
    `resume_state`) on the bit-identical trajectory.  This is the SURVEY §5
    mid-run checkpoint piece the reference lacks (its only warm start is the
    coarse model-file `relearn`, /root/reference/gp.cpp:439-534).

    state_dict maps the _State fields to arrays (w/r/p/s/delta/old_obj/lam/
    lam_bar/success/iter/converged) — numpy-serializable as-is
    (utils/checkpoint.save handles it).

    Like scg(), obj_tol is accepted for signature parity only: the
    reference's objective test is vacuous (module docstring), and the
    checkpointed segments run the identical iteration body."""
    args = tuple(jnp.asarray(a) for a in args)
    if resume_state is None:
        state = _scg_init(value_and_grad_fn, jnp.asarray(x0), args)
    else:
        state = _State(**{k: jnp.asarray(v) for k, v in
                          dict(resume_state).items()})
    it_dt = state.iter.dtype
    while int(state.iter) < max_iters and not bool(state.converged):
        iter_end = min(int(state.iter) + int(ckpt_every), max_iters)
        state = _scg_segment(value_and_grad_fn, state, args,
                             jnp.asarray(iter_end, dtype=it_dt), param_tol)
        if on_checkpoint is not None:
            on_checkpoint(int(state.iter), state._asdict())
    return ScgResult(x=state.w, obj=state.old_obj, iters=state.iter,
                     converged=state.converged)


def scg_minimize(fn: Callable, x0, max_iters: int = 1000,
                 param_tol: float = 1e-6, obj_tol: float = 1e-6,
                 jit: bool = True) -> ScgResult:
    """Convenience wrapper: builds value_and_grad from a scalar objective."""
    vag = jax.value_and_grad(fn)
    run = functools.partial(scg, vag, max_iters=max_iters,
                            param_tol=param_tol, obj_tol=obj_tol)
    if jit:
        run = jax.jit(run)
    return run(jnp.asarray(x0))
