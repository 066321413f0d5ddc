"""Decompose the mega-kernel's cost: leaf-factor share + unroll sweep.

Monkeypatches chol_mega._factor_diag with a pass-through (same GEMM/DMA
schedule, no leaf factorization) to isolate the diagonal-factor cost, and
sweeps the leaf column-loop unroll.  RTT-corrected, one session.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.expanduser("~"), ".cache", "gpc_tpu", "xla")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import jax.numpy as jnp
from jax import lax

import chol_mega_v2 as CM


def sync(x):
    return float(jnp.ravel(x)[0])


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    N, q, D = 16384, 8, 1
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, q)), dtype)
    m = jnp.asarray(rng.standard_normal((N, D)), dtype)
    iw = jnp.asarray(1.0, dtype)
    var = jnp.asarray(1.0, dtype)
    nz = jnp.asarray(0.1, dtype)
    flops = 2.0 * N * N * q + N ** 3 / 3.0 + 2.0 * N * N * D

    one = jnp.ones((1,), dtype)

    @jax.jit
    def triv(a):
        return a + 1.0
    sync(triv(one))
    t0 = time.perf_counter()
    for _ in range(10):
        sync(triv(one))
    rtt = (time.perf_counter() - t0) / 10
    say(f"sync RTT: {rtt*1e3:.2f} ms")

    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)

    @jax.jit
    def mm_chain(a, b):
        def body(_, acc):
            prod = lax.dot_general(acc, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            return (prod / (1.0 + jnp.abs(prod[0, 0]))).astype(a.dtype)
        return lax.fori_loop(0, 16, body, a)
    sync(mm_chain(A1, A2))
    t0 = time.perf_counter()
    sync(mm_chain(A1, A2))
    t_mm = (time.perf_counter() - t0 - rtt) / 16
    roof = 2 * B ** 3 / t_mm / 1e12
    say(f"roofline (RTT-corrected): {roof:.1f} TF/s")

    REPS = 10

    def time_mega(tag):
        f = jax.jit(CM.evidence_mega_rbf.__wrapped__,
                    static_argnames=("b", "interpret"))

        @jax.jit
        def run(X, m):
            def body(_, carry):
                acc, Xc = carry
                ld, quad = f(Xc, m, iw, var, nz, b=512)
                e = ld + quad
                return acc + e, Xc + (e * 0.0)
            return lax.fori_loop(0, REPS, body,
                                 (jnp.zeros((), dtype), X))[0]
        try:
            sync(run(X, m))
            t0 = time.perf_counter()
            sync(run(X, m))
            t = (time.perf_counter() - t0 - rtt) / REPS
            say(f"{tag:28s} {t*1e3:7.2f} ms  {flops/t/1e12:5.1f} TF/s "
                f"= {flops/t/1e12/roof:5.1%} of roof")
        except Exception as e:
            say(f"{tag} FAILED: {str(e)[:300]}")

    time_mega("mega v2 (normal)")

    real_factor = CM._factor_diag

    def fake_factor(A, b):
        # keep shapes/dtypes; positive diag for the log
        return A + 0.0, A * 0.01
    CM._factor_diag = fake_factor
    try:
        time_mega("mega v2 FAKELEAF")
    finally:
        CM._factor_diag = real_factor

    for unroll in (16, 32):
        old = CM._UNROLL
        CM._UNROLL = unroll
        try:
            time_mega(f"mega v2 unroll={unroll}")
        finally:
            CM._UNROLL = old

    # leaf-only microbench: 128 dependent _factor_diag(512) in one jit
    C0 = jnp.asarray(rng.standard_normal((512, 8)), dtype)
    Kl = C0 @ C0.T * 0.01 + jnp.eye(512, dtype=dtype)

    @jax.jit
    def leaf_chain(K):
        def body(_, Kc):
            L, M = CM._factor_diag(Kc, 512)
            return Kc + (1e-9 * M[0, 0]) * jnp.eye(512, dtype=dtype)
        return lax.fori_loop(0, 32, body, K)[0, 0]
    try:
        sync(leaf_chain(Kl))
        t0 = time.perf_counter()
        sync(leaf_chain(Kl))
        t = (time.perf_counter() - t0 - rtt) / 32
        say(f"_factor_diag(512) as XLA graph: {t*1e3:.3f} ms each "
            f"(x32 = {t*32*1e3:.1f} ms)")
    except Exception as e:
        say(f"leaf chain FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
