"""Session-health-aware cost decomposition for the N=16k evidence pipeline.

The shared TPU pool varies ~20× run to run, and the pipeline:roofline ratio
is NOT constant across that variance (slow sessions: ~100% of same-session
roofline; fast sessions: ~50%) — so fixed overheads (op dispatch, leaf
floors, copies) only become visible on a healthy chip.  This probe prints
everything incrementally (one claim per process run; results interpretable
per-session via the roofline line).  Run repeatedly until a fast session
(roofline ≳ 80 TF/s) is caught.
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

from gpc_tpu.ops import evidence_fast as EF
from gpc_tpu.ops.evidence_fast import Policy, evidence_left_fast
from gpc_tpu.ops.lazy_evidence import rbf_block_fn


def sync(x):
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, reps=3):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    return (time.perf_counter() - t0) / reps


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

    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    t_mm = timeit(mm, A1, A2, reps=10)
    roof = 2 * B ** 3 / t_mm / 1e12
    say(f"ROOFLINE {roof:.1f} TF/s  (bf16 8192³ matmul)")

    def report(name, t):
        say(f"{name:34s} {t*1e3:7.2f} ms  {flops/t/1e12:5.1f} TF/s "
            f"= {flops/t/1e12/roof:5.1%} of roof")

    # --- dispatch floor: K dependent tiny GEMMs --------------------------
    T1 = jnp.asarray(rng.standard_normal((128, 128)), dtype)

    @jax.jit
    def tiny_chain(a):
        def body(_, acc):
            return acc @ T1 * (1.0 / (1.0 + jnp.abs(acc[0, 0])))
        return lax.fori_loop(0, 256, body, a)
    t = timeit(tiny_chain, T1)
    say(f"dispatch floor: {t/256*1e6:7.1f} us per dependent tiny op "
        f"({t*1e3:.2f} ms / 256)")

    # 256 dependent 1024³ bf16 GEMMs: mid-size GEMM rate in a chain
    G1 = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.bfloat16)

    @jax.jit
    def mid_chain(a):
        def body(_, acc):
            p = lax.dot_general(acc, G1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return (p / (1.0 + jnp.abs(p[0, 0]))).astype(jnp.bfloat16)
        return lax.fori_loop(0, 64, body, a)
    t = timeit(mid_chain, G1)
    r = 64 * 2 * 1024 ** 3 / t / 1e12
    say(f"1024^3 bf16 chain: {t/64*1e6:6.1f} us/GEMM  {r:.1f} TF/s "
        f"= {r/roof:.1%} of roof")

    # --- leaf floors ------------------------------------------------------
    from jax.scipy.linalg import solve_triangular
    from gpc_tpu.ops.chol_pallas import chol_inv_block
    C0 = jnp.asarray(rng.standard_normal((1024, 8)), dtype)
    for n in (512, 1024):
        Kl = (C0[:n] @ C0[:n].T * 0.01 + jnp.eye(n, dtype=dtype))

        @jax.jit
        def chol8(K):
            def body(_, Kc):
                L = jnp.linalg.cholesky(Kc)
                return Kc + (1e-9 * L[0, 0]) * jnp.eye(n, dtype=dtype)
            return lax.fori_loop(0, 8, body, K)[0, 0]
        t = timeit(chol8, Kl)
        say(f"XLA chol({n}) dependent: {t/8*1e3:6.3f} ms each")

        @jax.jit
        def ci8(K):
            def body(_, Kc):
                L, M = chol_inv_block(Kc)
                return Kc + (1e-9 * M[0, 0]) * jnp.eye(n, dtype=dtype)
            return lax.fori_loop(0, 8, body, K)[0, 0]
        try:
            t = timeit(ci8, Kl)
            say(f"Pallas chol_inv({n}) dependent: {t/8*1e3:6.3f} ms each")
        except Exception as e:
            say(f"Pallas chol_inv({n}) FAILED: {str(e)[:120]}")

        @jax.jit
        def tr8(K):
            L = jnp.linalg.cholesky(K)
            def body(_, Lc):
                M = solve_triangular(Lc, jnp.eye(n, dtype=dtype), lower=True)
                return Lc + (1e-9 * M[0, 0]) * jnp.eye(n, dtype=dtype)
            return lax.fori_loop(0, 8, body, L)[0, 0]
        t = timeit(tr8, Kl)
        say(f"XLA trsm-vs-I({n}) dependent: {t/8*1e3:6.3f} ms each")

    # --- concat cost ------------------------------------------------------
    P1 = jnp.asarray(rng.standard_normal((8192, 4096)), jnp.bfloat16)
    P2 = jnp.asarray(rng.standard_normal((8192, 4096)), jnp.bfloat16)

    @jax.jit
    def cat(a, b):
        def body(_, ab):
            a, b = ab
            c = jnp.concatenate([a, b], axis=1)
            return (a + c[:, :1] * 0.0, b)
        return lax.fori_loop(0, 8, body, (a, b))[0]
    t = timeit(cat, P1, P2)
    gb = 8192 * 8192 * 2 * 2 / 1e9  # read both + write result, bf16
    say(f"hstack(8192x4096 bf16 x2): {t/8*1e3:6.3f} ms each "
        f"(~{gb/(t/8):.0f} GB/s effective)")

    # --- pipelines --------------------------------------------------------
    def pipe(pol):
        @jax.jit
        def run(X, m):
            kfn = rbf_block_fn(X, iw, var, nz)
            ld, quad = evidence_left_fast(kfn, N, m, pol)
            return ld + quad
        return run

    real_leaf = EF._leaf
    def fake_leaf(A, b, p):
        M = A * 0.5
        v = jnp.matmul(M, b, preferred_element_type=A.dtype)
        return (("leaf", A, M), v,
                jnp.sum(jnp.log(jnp.abs(jnp.diagonal(A)))))

    for name, pol, fake in [
        ("full b1024 xla stack", Policy(1024, True, "xla", True), False),
        ("full b1024 xla prestack", Policy(1024, True, "xla", True, True), False),
        ("full b512  xla stack", Policy(512, True, "xla", True), False),
        ("full b1024 pallas prestack", Policy(1024, True, "pallas", True, True), False),
        ("full b512  pallas stack", Policy(512, True, "pallas", True), False),
        ("FAKELEAF b1024 stack", Policy(1024, True, "xla", True), True),
        ("FAKELEAF b1024 prestack", Policy(1024, True, "xla", True, True), True),
        ("FAKELEAF b2048 stack", Policy(2048, True, "xla", True), True),
    ]:
        if fake:
            EF._leaf = fake_leaf
        try:
            report(name, timeit(pipe(pol), X, m))
        except Exception as e:
            say(f"{name} FAILED: {str(e)[:160]}")
        finally:
            EF._leaf = real_leaf


if __name__ == "__main__":
    main()
