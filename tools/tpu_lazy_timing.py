"""TPU timing: dense Gram→evidence_fused vs lazy-Gram evidence at N=16k.

Within-session comparison only (pool throughput varies run-to-run); prints the
per-variant ms and the matmul roofline proxy for context.
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
    noise = jnp.asarray(1e-2, dtype)

    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    t_mm = timeit(mm, A1, A2, reps=10)
    print(f"matmul roofline proxy: {2 * B**3 / t_mm / 1e12:.1f} TFLOP/s "
          f"({t_mm*1e3:.2f} ms)")

    from gpc_tpu.ops.chol_blocked import evidence_fused
    from gpc_tpu.ops.lazy_evidence import (
        evidence_fused_left, evidence_fused_lazy, rbf_block_fn,
        rbf_evidence_lazy)

    @jax.jit
    def dense(X, m):
        n2 = jnp.sum(X * X, axis=1, keepdims=True)
        xxt = jnp.matmul(X, X.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(n2 + n2.T - 2.0 * xxt, 0.0)
        K = var * jnp.exp(-0.5 * iw * d2) + noise * jnp.eye(N, dtype=dtype)
        logdet, quad, _L = evidence_fused(K, m)
        return logdet + quad

    @jax.jit
    def lazy(X, m):
        logdet, quad = rbf_evidence_lazy(X, m, iw, var, noise)
        return logdet + quad

    @jax.jit
    def left(X, m):
        kfn = rbf_block_fn(X, iw, var, noise)
        logdet, quad, _L = evidence_fused_left(kfn, N, m)
        return logdet + quad

    t_dense = timeit(dense, X, m)
    t_lazy = timeit(lazy, X, m)
    t_left = timeit(left, X, m)
    flops = 2.0 * N * N * q + N**3 / 3.0 + 2.0 * N * N * D
    print(f"dense: {t_dense*1e3:.1f} ms ({flops/t_dense/1e12:.1f} TFLOP/s)")
    print(f"lazy:  {t_lazy*1e3:.1f} ms ({flops/t_lazy/1e12:.1f} TFLOP/s)")
    print(f"left:  {t_left*1e3:.1f} ms ({flops/t_left/1e12:.1f} TFLOP/s)")
    print(f"value check: dense={sync(dense(X, m)):.4f} "
          f"lazy={sync(lazy(X, m)):.4f} left={sync(left(X, m)):.4f}")


if __name__ == "__main__":
    main()
