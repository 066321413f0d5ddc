"""TPU sweep: evidence_fused_left leaf size (BASE) at N=16k.

BASE=256 was tuned for the dense recursive path; the left-looking lazy
recursion replaces the big trailing syrks with per-descendant correction
GEMMs, so its optimum may differ.  Patches BASE in both modules before each
trace (recursion is unrolled at trace time).  Within-session comparison only.
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
    from gpc_tpu.ops import chol_blocked, lazy_evidence

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

    flops = 2.0 * N * N * q + N**3 / 3.0 + 2.0 * N * N * D
    for base in (128, 256, 512, 1024):
        chol_blocked.BASE = base
        lazy_evidence.BASE = base

        @jax.jit
        def left(X, m):
            kfn = lazy_evidence.rbf_block_fn(X, iw, var, noise)
            logdet, quad, _L = lazy_evidence.evidence_fused_left(kfn, N, m)
            return logdet + quad

        t = timeit(left, X, m)
        print(f"BASE={base:5d}: {t*1e3:.1f} ms ({flops/t/1e12:.1f} TFLOP/s) "
              f"value={sync(left(X, m)):.2f}")


if __name__ == "__main__":
    main()
