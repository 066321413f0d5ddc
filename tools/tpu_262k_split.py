"""N=262,144 matrix-free FTC evidence value+grad on ONE chip — split calls.

The monolithic value+grad jit at N=262,144 is a single ~65 s device
execution, and the shared axon pool kills device calls somewhere past
~45-60 s ("TPU worker process crashed" — reproduced twice at 262k while
the 196k/42 s and 131k/16 s calls run fine; see tools/tpu_262k.py).  This
probe runs the SAME estimator (CG quad + 8x20 SLQ logdet + analytic
fixed-probe gradient, ops/iterative.py:279-343) as TEN sub-watchdog device
calls:

  1. one multi-RHS CG solve of [m | Z]           (60 MVMs, ~17 s)
  2. eight single-probe SLQ logdet calls, averaged (20 MVMs each, ~6 s)
  3. one gradient-contraction call: jax.grad of the blockwise
     rematerialized  g_ld.tr_hat - g_quad.aKa  (ops/iterative evidence_bwd
     form) plus mbar = 2 g_quad alpha

This is exactly how a production driver would pipeline the engine past a
per-call watchdog; the estimator is statistically identical (independent
Rademacher probes).  The reference's practical FTC ceiling is N~1k
(/root/reference/README.md:412-414) — this is ~260x past it on one chip.

Usage: python tools/tpu_262k_split.py [N] [block]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.ravel(x)[0])


def main():
    jax.config.update("jax_platforms", "axon,cpu")
    assert jax.default_backend() not in ("cpu",)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    @jax.jit
    def _t(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_t(one))
    rtt = min((lambda t0: (sync(_t(one)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(8))
    print(f"rtt={rtt*1e3:.1f} ms", flush=True)

    from gpc_tpu import kernels as GK
    from gpc_tpu.ops.iterative import cg_solve, kernel_mvm, slq_logdet
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, 2)), jnp.float32)
    m = jnp.asarray(np.sin(np.asarray(X)[:, :1]).astype(np.float32)
                    + 0.1 * rng.standard_normal((N, 1)).astype(np.float32))
    kern = GK.Cmpnd(input_dim=2, components=(
        GK.Rbf(input_dim=2), GK.Bias(input_dim=2), GK.White(input_dim=2)))
    p0 = jnp.asarray(np.array([1.0, 1.0, 0.135, 0.135]), jnp.float32)
    CG_ITERS, PROBES, LANCZOS, TRACE = 60, 8, 20, 8

    key = jax.random.PRNGKey(0)
    k_tr, k_slq = jax.random.split(jax.random.fold_in(key, N))
    Z = jax.random.rademacher(k_tr, (N, TRACE), dtype=jnp.float32)

    @jax.jit
    def solve_call(p, X, B):
        mvm = lambda V: kernel_mvm(kern, p, X, V, block=block)
        return cg_solve(mvm, B, max_iters=CG_ITERS).x

    # 4 probes per call: SLQ batches its probes through ONE blocked MVM on an
    # (N, probes) panel — the Gram build dominates, so probes-per-call is
    # nearly free until the call hits the pool watchdog (~60 s)
    PROBES_PER_CALL = 4

    @jax.jit
    def slq_call(p, X, k):
        mvm = lambda V: kernel_mvm(kern, p, X, V, block=block)
        return slq_logdet(mvm, N, k, probes=PROBES_PER_CALL,
                          lanczos_iters=LANCZOS, dtype=jnp.float32)

    @jax.jit
    def grad_call(p, X, alpha, W, g_ld, g_quad):
        def contracted(p_, X_):
            s_q = jnp.sum(alpha * kernel_mvm(kern, p_, X_, alpha, block=block))
            s_tr = jnp.sum(W * kernel_mvm(kern, p_, X_, Z, block=block))
            return g_ld * s_tr / TRACE - g_quad * s_q
        return jax.grad(contracted, argnums=(0,))(p, X)[0]

    times = []

    def timed(label, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        s = sync(out if not isinstance(out, tuple) else out[0])
        dt = time.perf_counter() - t0 - rtt
        times.append(dt)
        print(f"  {label}: {dt:.2f} s (first value {s:.4f})", flush=True)
        return out

    B = jnp.concatenate([m, Z], axis=1)
    n_slq_calls = -(-PROBES // PROBES_PER_CALL)
    for rep in range(2):               # rep 0 pays compiles; rep 1 is warm
        times.clear()
        t_all = time.perf_counter()
        sols = timed("CG solve [m|Z] (60 iters)", solve_call, p0, X, B)
        alpha, W = sols[:, :1], sols[:, 1:]
        quad = float(jnp.sum(m * alpha))
        lds = [timed(f"SLQ probes {i*PROBES_PER_CALL}..", slq_call, p0, X,
                     jax.random.fold_in(k_slq, i)) for i in range(n_slq_calls)]
        logdet = float(np.mean([float(v) for v in lds]))
        g = timed("gradient contraction", grad_call, p0, X, alpha, W,
                  jnp.float32(0.5), jnp.float32(0.5))
        wall = time.perf_counter() - t_all
        value = 0.5 * (quad + logdet)
        print(f"N={N} value+grad (split calls, "
              f"{'warm' if rep else 'cold'}): value {value:.2f} "
              f"(quad {quad:.2f}, logdet {logdet:.2f}), grad "
              f"{np.asarray(g).round(4).tolist()} finite "
              f"{np.isfinite(np.asarray(g)).all()}", flush=True)
        print(f"N={N} step wall {wall:.2f} s (device calls sum "
              f"{sum(times):.2f} s, max single call {max(times):.2f} s)",
              flush=True)


if __name__ == "__main__":
    main()
