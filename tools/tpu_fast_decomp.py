"""Decompose the N=16k evidence pipeline cost on TPU (within-session A/B).

Variants isolate: Gram-tile fusion cost, RHS-solve chain cost, leaf
chol+inverse cost, and leaf-width scaling — to direct the next optimization.
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
        print(f"{name:34s} {t*1e3:6.1f} ms  {flops/t/1e12:5.1f} TF/s "
              f" {flops/t/1e12/roof:5.1%}", flush=True)

    pol = Policy(1024, True, "xla", True)

    # 1. full pipeline (baseline)
    @jax.jit
    def full(X, m):
        kfn = rbf_block_fn(X, iw, var, nz)
        ld, quad = evidence_left_fast(kfn, N, m, pol)
        return ld + quad
    report("full b1024-xla", timeit(full, X, m))

    # 2. dense-pregram: materialize K (bf16) once, factor from slices —
    #    difference vs (1) ≈ net cost of fused Gram-tile materialization
    @jax.jit
    def pregram(X, m):
        n2 = jnp.sum(X * X, axis=1)
        d2 = jnp.maximum(n2[:, None] + n2[None, :] - 2.0 * (X @ X.T), 0.0)
        K = (var * jnp.exp(-0.5 * iw * d2)).astype(jnp.bfloat16)
        Kd = K.astype(jnp.float32) + nz * jnp.eye(N, dtype=jnp.float32)
        kfn = lambda i0, j0, bi, bj: jax.lax.slice(
            Kd, (i0, j0), (i0 + bi, j0 + bj))
        ld, quad = evidence_left_fast(kfn, N, m, pol)
        return ld + quad
    report("pregram dense K then factor", timeit(pregram, X, m))

    # 3. fake leaves: replace chol+inverse with pass-throughs (same GEMM
    #    schedule, no leaf factorization ops) — difference vs (1) ≈ leaf cost
    real_leaf = EF._leaf
    def fake_leaf(A, b, p):
        L = A
        M = A * 0.5  # any dense matrix: keeps the leaf GEMMs, drops chol/trsm
        v = jnp.matmul(M, b, preferred_element_type=A.dtype)
        return ("leaf", L, M), v, jnp.sum(jnp.log(jnp.abs(jnp.diagonal(A))))
    EF._leaf = fake_leaf
    try:
        @jax.jit
        def noleaf(X, m):
            kfn = rbf_block_fn(X, iw, var, nz)
            ld, quad = evidence_left_fast(kfn, N, m, pol)
            return ld + quad
        report("fake leaves (no chol/trsm)", timeit(noleaf, X, m))
    finally:
        EF._leaf = real_leaf

    # 4. leaf width 2048
    report("full b2048-xla", timeit(jax.jit(
        lambda X, m: sum(evidence_left_fast(
            rbf_block_fn(X, iw, var, nz), N, m,
            Policy(2048, True, "xla", True)))), X, m))

    # 5. nostack at b1024 (concat copies vs per-ancestor GEMMs)
    report("full b1024-xla nostack", timeit(jax.jit(
        lambda X, m: sum(evidence_left_fast(
            rbf_block_fn(X, iw, var, nz), N, m,
            Policy(1024, True, "xla", False)))), X, m))


if __name__ == "__main__":
    main()
