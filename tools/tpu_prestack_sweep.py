"""One-process TPU batch: prestacked-corr evidence sweep + cost decomposition.

Run after the per-block-concat analysis (2026-08-21): the stacked `_corr`
re-materializes ~N³/(3·base) bytes of GEMM operands at N=16k; `prestack`
hoists the stacking to once per recursion node (O(N²·log) copies).  This
sweep measures both schedules, plus isolation probes:
  * XLA cholesky floor (leaf-count × chol(base) alone),
  * fake-leaf pipeline (GEMM schedule with pass-through leaves),
  * Pallas chol_inv leaf cost alone.
Claimed once per process — keep everything in this file.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu.ops import evidence_fast as EF
from gpc_tpu.ops.evidence_fast import Policy, evidence_left_fast
from gpc_tpu.ops.lazy_evidence import rbf_block_fn


def sync(x):
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, reps=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    N, q, D = 16384, 8, 1
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, q)), dtype)
    m = jnp.asarray(rng.standard_normal((N, D)), dtype)
    iw = jnp.asarray(1.0, dtype)
    var = jnp.asarray(1.0, dtype)
    nz = jnp.asarray(0.1, dtype)

    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    t_mm = timeit(mm, A1, A2, reps=10)
    roof = 2 * B ** 3 / t_mm / 1e12
    print(f"roofline: {roof:.1f} TF/s", flush=True)
    flops = 2.0 * N * N * q + N ** 3 / 3.0 + 2.0 * N * N * D

    def report(name, t):
        print(f"{name:36s} {t*1e3:6.1f} ms  {flops/t/1e12:5.1f} TF/s "
              f" {flops/t/1e12/roof:5.1%}", flush=True)

    def pipe(pol):
        @jax.jit
        def run(X, m):
            kfn = rbf_block_fn(X, iw, var, nz)
            ld, quad = evidence_left_fast(kfn, N, m, pol)
            return ld + quad
        return run

    # --- schedule sweep ----------------------------------------------------
    cands = [
        ("b1024 xla  stack   (r2 bench)", Policy(1024, True, "xla", True)),
        ("b1024 xla  prestack",          Policy(1024, True, "xla", True, True)),
        ("b512  xla  prestack",          Policy(512, True, "xla", True, True)),
        ("b2048 xla  prestack",          Policy(2048, True, "xla", True, True)),
        ("b1024 chol prestack",          Policy(1024, True, False, True, True)),
        ("b1024 pal  prestack",          Policy(1024, True, "pallas", True, True)),
        ("b512  pal  prestack",          Policy(512, True, "pallas", True, True)),
    ]
    best = (None, 1e9)
    for name, pol in cands:
        try:
            t = timeit(pipe(pol), X, m)
        except Exception as e:
            print(f"{name:36s} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        report(name, t)
        if t < best[1]:
            best = (name, t)
    print(f"best: {best[0]} {best[1]*1e3:.1f} ms", flush=True)

    # --- decomposition probes ----------------------------------------------
    # XLA cholesky floor: 16 dependent chol(1024)
    C0 = jnp.asarray(rng.standard_normal((1024, 8)), dtype)
    Kleaf = C0 @ C0.T * 0.01 + jnp.eye(1024, dtype=dtype)

    @jax.jit
    def chol16(K):
        def body(_, Kc):
            L = jnp.linalg.cholesky(Kc)
            return Kc + 1e-9 * L[0, 0] * jnp.eye(1024, dtype=dtype)
        return jax.lax.fori_loop(0, 16, body, K)[0, 0]
    t = timeit(chol16, Kleaf)
    print(f"16x dependent XLA chol(1024): {t*1e3:.2f} ms "
          f"({t/16*1e3:.3f} ms each)", flush=True)

    @jax.jit
    def cholinv16(K):
        from jax.scipy.linalg import solve_triangular
        def body(_, Kc):
            L = jnp.linalg.cholesky(Kc)
            M = solve_triangular(L, jnp.eye(1024, dtype=dtype), lower=True)
            return Kc + 1e-9 * M[0, 0] * jnp.eye(1024, dtype=dtype)
        return jax.lax.fori_loop(0, 16, body, K)[0, 0]
    t = timeit(cholinv16, Kleaf)
    print(f"16x dependent XLA chol+trsmI(1024): {t*1e3:.2f} ms "
          f"({t/16*1e3:.3f} ms each)", flush=True)

    from gpc_tpu.ops.chol_pallas import chol_inv_block

    @jax.jit
    def pal16(K):
        def body(_, Kc):
            L, M = chol_inv_block(Kc)
            return Kc + 1e-9 * M[0, 0] * jnp.eye(1024, dtype=dtype)
        return jax.lax.fori_loop(0, 16, body, K)[0, 0]
    try:
        t = timeit(pal16, Kleaf)
        print(f"16x dependent Pallas chol_inv(1024): {t*1e3:.2f} ms "
              f"({t/16*1e3:.3f} ms each)", flush=True)
    except Exception as e:
        print(f"Pallas chol_inv(1024) FAILED: {e}", flush=True)

    # fake leaves on the prestack schedule: pure GEMM cost
    real_leaf = EF._leaf
    def fake_leaf(A, b, p):
        M = A * 0.5
        v = jnp.matmul(M, b, preferred_element_type=A.dtype)
        return (("leaf", A, M), v,
                jnp.sum(jnp.log(jnp.abs(jnp.diagonal(A)))))
    EF._leaf = fake_leaf
    try:
        for nm, pol in [("fakeleaf b1024 prestack",
                         Policy(1024, True, "xla", True, True)),
                        ("fakeleaf b1024 stack",
                         Policy(1024, True, "xla", True, False))]:
            report(nm, timeit(pipe(pol), X, m))
    finally:
        EF._leaf = real_leaf


if __name__ == "__main__":
    main()
