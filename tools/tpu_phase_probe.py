"""TPU probe: per-phase cost attribution for the N=16k evidence pipeline.

Round-3 finding: three very different schedules (stacked recursion, flat
DUS buffer, Pallas mega) all land at 16.5-18.3 ms vs the 8.8 ms "panel-dot
floor" — so the residual is NOT schedule-specific dispatch/copy overhead.
Hypotheses measured here (RTT-corrected; every chained rep feeds its result
back into the next iteration's INPUTS so nothing hoists out of the loop):

  A. dot intensity: a (m,k)x(k,w) bf16 dot reads ~2mk bytes for 2mkw flops
     — intensity ≈ w flops/byte.  v5e needs ~480 fl/B to be compute-bound,
     so w=512 panels would be HBM-bound at ~50% MXU.  Measure TF/s vs w.
  B. leaf cost: chained XLA chol(b) f32, trsm-vs-identity(b), and the
     Pallas fused chol+inv — the serial non-MXU critical-path component.
  C. fake-leaf evidence: the flat schedule with the leaf factorization
     replaced by a near-free stand-in — isolates schedule+dots from leaf.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular


def sync(x):
    return float(jnp.ravel(x)[0])


def rtt_measure():
    @jax.jit
    def _t(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_t(one))
    samples = []
    for _ in range(8):
        t0 = time.perf_counter()
        sync(_t(one))
        samples.append(time.perf_counter() - t0)
    return min(samples)


def timeit(pipe, args, reps, rtt):
    sync(pipe(*args))
    t0 = time.perf_counter()
    sync(pipe(*args))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / reps


def main():
    rtt = rtt_measure()
    print(f"rtt={rtt*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)

    # --- roofline reference -------------------------------------------------
    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)

    @jax.jit
    def mm_chain(a, b):
        def body(_, acc):
            p = lax.dot_general(acc, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return (p / (1.0 + jnp.abs(p[0, 0]))).astype(a.dtype)
        return lax.fori_loop(0, 16, body, a)
    t = timeit(mm_chain, (A1, A2), 16, rtt)
    print(f"roofline 8192^3: {2*B**3/t/1e12:.0f} TF/s", flush=True)

    # --- A: dot TF/s vs output width w (carry feeds P MULTIPLICATIVELY —
    # an additive scalar/rank-1 perturbation distributes through the dot and
    # XLA exploits it: the first probe run reported >peak TF/s at w>=1024)
    m, k = 12288, 8192
    P0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    reps_a = 40
    for w in (256, 512, 768, 1024, 2048):
        Q = jnp.asarray(rng.standard_normal((k, w)), jnp.bfloat16)

        @jax.jit
        def dchain(P, Q):
            def body(_, P):
                r = lax.dot_general(P, Q, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                s = (1.0 + r[0, 0] * 1e-30).astype(jnp.bfloat16)
                return P * s
            return lax.fori_loop(0, reps_a, body, P)[0, 0]
        t = timeit(dchain, (P0, Q), reps_a, rtt)
        print(f"dot ({m},{k})x({k},{w}): {t*1e3:.2f} ms "
              f"= {2*m*k*w/t/1e12:.0f} TF/s (intensity ~{w} fl/B)",
              flush=True)

    # --- A2: BATCHED leaf chol — the deferred-logdet design point: 32
    # (512,512) blocks in ONE op share the 512-step column chain, so the
    # per-leaf serial latency amortizes across the batch
    for (nb_, b_) in ((32, 512), (16, 1024), (64, 256)):
        Araw = rng.standard_normal((nb_, b_, 16)).astype(np.float32)
        Kb = jnp.asarray(np.einsum("bik,bjk->bij", Araw, Araw) * 0.02
                         + np.eye(b_, dtype=np.float32))

        @jax.jit
        def bchol_chain(Kb):
            def body(_, Kb):
                L = jnp.linalg.cholesky(Kb)
                return Kb + L[0, 0, 0] * 1e-30
            return lax.fori_loop(0, 64, body, Kb)[0, 0, 0]
        t = timeit(bchol_chain, (Kb,), 64, rtt)
        print(f"BATCHED chol ({nb_}x{b_}): {t*1e3:.3f} ms per batch "
              f"(vs {nb_} serial XLA chols)", flush=True)

    # --- B: leaf costs, 512 chained reps ------------------------------------
    reps_b = 512
    for b in (256, 512, 1024):
        Araw = rng.standard_normal((b, 16)).astype(np.float32)
        K = jnp.asarray(Araw @ Araw.T * 0.02 + np.eye(b, dtype=np.float32))

        @jax.jit
        def chol_chain(K):
            def body(_, K):
                L = jnp.linalg.cholesky(K)
                return K + L[0, 0] * 1e-30
            return lax.fori_loop(0, reps_b, body, K)[0, 0]
        t = timeit(chol_chain, (K,), reps_b, rtt)
        print(f"XLA chol({b}): {t*1e3:.3f} ms each", flush=True)

        @jax.jit
        def cholinv_chain(K):
            I = jnp.eye(b, dtype=jnp.float32)

            def body(_, K):
                L = jnp.linalg.cholesky(K)
                M = solve_triangular(L, I, lower=True)
                return K + M[0, 0] * 1e-30
            return lax.fori_loop(0, reps_b, body, K)[0, 0]
        t = timeit(cholinv_chain, (K,), reps_b, rtt)
        print(f"XLA chol+trsmI({b}): {t*1e3:.3f} ms each", flush=True)

        from gpc_tpu.ops.chol_pallas import chol_inv_block

        @jax.jit
        def pal_chain(K):
            def body(_, K):
                L, M = chol_inv_block(K)
                return K + M[0, 0] * 1e-30
            return lax.fori_loop(0, reps_b, body, K)[0, 0]
        try:
            t = timeit(pal_chain, (K,), reps_b, rtt)
            print(f"pallas chol+inv({b}): {t*1e3:.3f} ms each", flush=True)
        except Exception as e:
            print(f"pallas chol+inv({b}) FAILED {type(e).__name__}",
                  flush=True)

    # --- C: flat evidence, real vs fake leaf (evidence reads the CARRY) -----
    from gpc_tpu.ops.evidence_fast import Policy, evidence_flat
    from gpc_tpu.ops.lazy_evidence import rbf_block_fn
    import gpc_tpu.ops.evidence_fast as EF

    N, q = 16384, 8
    X0 = jnp.asarray(rng.standard_normal((N, q)), jnp.float32)
    mv = jnp.asarray(rng.standard_normal((N, 1)), jnp.float32)
    iw = jnp.asarray(1.0, jnp.float32)
    var = jnp.asarray(1.0, jnp.float32)
    noi = jnp.asarray(0.1, jnp.float32)
    real_leaf = EF._leaf

    def fake_leaf(A, b, pol):
        d = jnp.abs(A[0:1, :]).T + 1.0
        M = jnp.eye(A.shape[0], dtype=A.dtype) / d
        return (("leaf", M, M), M @ b, jnp.sum(jnp.log(d)))

    def make_pipe(b):
        pol = Policy(b, True, "xla", True)

        @jax.jit
        def pipe(X, mv):
            def body(_, carry):
                acc, Xc = carry
                kfn = rbf_block_fn(Xc, iw, var, noi)   # reads the CARRY
                ld, qd = evidence_flat(kfn, N, mv, pol)
                e = ld + qd
                return acc + e, Xc + e * 0.0
            return lax.fori_loop(0, 8, body,
                                 (jnp.zeros((), jnp.float32), X))[0]
        return pipe

    for b in (512, 1024, 2048):
        try:
            t = timeit(make_pipe(b), (X0, mv), 8, rtt)
            print(f"flat-b{b} real leaf: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"flat-b{b} real leaf FAILED {type(e).__name__}",
                  flush=True)
        EF._leaf = fake_leaf
        try:
            t = timeit(make_pipe(b), (X0, mv), 8, rtt)
            print(f"flat-b{b} FAKE leaf: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"flat-b{b} FAKE leaf FAILED {type(e).__name__}",
                  flush=True)
        finally:
            EF._leaf = real_leaf


if __name__ == "__main__":
    main()
