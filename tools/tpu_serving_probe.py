"""TPU probe: posterior (serving) throughput for a trained N=16k FTC GP.

Serving decomposes into a one-time factor (L, α) and per-batch work:
  mean:      μ* = k*ᵀα                     (2·T·N·(q-dot) — MXU)
  variance:  σ*² = k** − ‖L⁻¹k*‖²          (one N×N vs N×T trsm + syrk)
Measured per 65,536-point test batch, RTT-corrected.  The reference serves
predictions through the same math single-threaded in LAPACK
(/root/reference/CGp.cpp:535-625); here the whole batch is one jitted
program on the MXU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def sync(x):
    return float(jnp.ravel(x)[0])


def main():
    N, T, q = 16384, 65536, 8
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, q)), jnp.float32)
    Xt = jnp.asarray(rng.standard_normal((T, q)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((N, 1)), jnp.float32)
    iw, var, noise = 1.0, 1.0, 0.1

    @jax.jit
    def _t(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_t(one))
    rtt = min((lambda s: (sync(_t(one)), time.perf_counter() - s)[1])(
        time.perf_counter()) for _ in range(8))
    print(f"rtt={rtt*1e3:.1f} ms", flush=True)

    def gram(A, B):
        na = jnp.sum(A * A, axis=1)
        nb = jnp.sum(B * B, axis=1)
        d2 = jnp.maximum(na[:, None] + nb[None, :]
                         - 2.0 * (A @ B.T), 0.0)
        return var * jnp.exp(-0.5 * iw * d2)

    from gpc_tpu.linalg import blocked_tri_inv as blocked_trinv

    @jax.jit
    def factor(X, m):
        K = gram(X, X) + noise * jnp.eye(N, dtype=jnp.float32)
        L = jnp.linalg.cholesky(K)
        alpha = solve_triangular(
            L.T, solve_triangular(L, m, lower=True), lower=False)
        return L, blocked_trinv(L), alpha

    t0 = time.perf_counter()
    L, Linv, alpha = factor(X, m)
    sync(alpha)
    print(f"one-time factor+inverse N={N}: {time.perf_counter()-t0-rtt:.2f}s "
          f"(incl. compile)", flush=True)

    reps = 4

    @jax.jit
    def mean_only(L, alpha, Xt):
        def body(_, carry):
            acc, Xc = carry
            mu = gram(Xc, X) @ alpha
            s = jnp.sum(mu)
            return acc + s, Xc + s * 0.0
        return jax.lax.fori_loop(0, reps, body,
                                 (jnp.zeros((), jnp.float32), Xt))[0]

    CH = 8192  # per-chunk (N, CH) work keeps intermediates bounded

    @jax.jit
    def mean_var(Linv, alpha, Xt):
        def body(_, carry):
            acc, Xc = carry

            def chunk(c, s):
                Xb = jax.lax.dynamic_slice(Xc, (c * CH, 0), (CH, q))
                kX = gram(X, Xb)                   # (N, CH)
                mu = kX.T @ alpha
                v = Linv @ kX                      # pure GEMM solve
                varp = var + noise - jnp.sum(v * v, axis=0)
                return s + jnp.sum(mu) + jnp.sum(varp)
            s = jax.lax.fori_loop(0, T // CH, chunk,
                                  jnp.zeros((), jnp.float32))
            return acc + s, Xc + s * 0.0
        return jax.lax.fori_loop(0, reps, body,
                                 (jnp.zeros((), jnp.float32), Xt))[0]

    for tag, fn, op in (("mean-only", mean_only, None),
                        ("mean+variance", mean_var, None)):
        first = L if fn is mean_only else Linv
        sync(fn(first, alpha, Xt))
        t0 = time.perf_counter()
        sync(fn(first, alpha, Xt))
        t = max(time.perf_counter() - t0 - rtt, 1e-9) / reps
        print(f"{tag}: {t*1e3:.1f} ms per {T}-point batch "
              f"= {T/t/1e6:.2f} M predictions/s", flush=True)


if __name__ == "__main__":
    main()
