"""Round-5 TPU measurement batch: one session claim, every A/B in one run.

Measures (bench.py methodology — RTT-corrected, ≥10 chained reps per sync,
min-of-3):
  1. session matmul roofline (healthy ≥ ~150 TF/s bf16 — CLAUDE.md),
  2. panel kernel A/B: full | leaf256 | span4 | leaf256+span4 (the round-5
     leaf-chain and solve-span levers, VERDICT r4 ask #1b) + flat-b512
     same-session reference → panel_vs_flat ratio,
  3. accuracy drift per candidate vs f32-HIGH lazy evidence,
  4. product-engine forward (ops/panel_engine with bias split, ragged
     N=16000) and the diag-mode residual cost,
  5. the compiled-mode correctness sweep (tools/tpu_panel_compiled_sweep).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "axon,cpu")
    assert jax.default_backend() not in ("cpu",)

    from gpc_tpu.ops.chol_panel import evidence_panel_rbf, panel_state_rbf
    from gpc_tpu.ops.evidence_fast import Policy, evidence_left_fast, \
        evidence_flat
    from gpc_tpu.ops.lazy_evidence import rbf_block_fn

    rng = np.random.default_rng(0)
    N, q, D = 16384, 8, 1
    X = jnp.asarray(rng.standard_normal((N, q)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    iw = jnp.float32(1.0)
    var = jnp.float32(1.0)
    noise = jnp.float32(0.1)
    reps = 10

    def sync(x):
        return float(jnp.ravel(x)[0])

    @jax.jit
    def _triv(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_triv(one))
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        sync(_triv(one))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"rtt {rtt*1e3:.1f} ms")

    # roofline
    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)

    @jax.jit
    def mm_chain(a, b):
        def body(_, acc):
            prod = jax.lax.dot_general(acc, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            return (prod / (1.0 + jnp.abs(prod[0, 0]))).astype(a.dtype)
        return jax.lax.fori_loop(0, 16, body, a)

    sync(mm_chain(A1, A2))
    t0 = time.perf_counter()
    sync(mm_chain(A1, A2))
    t_mm = max(time.perf_counter() - t0 - rtt, 1e-9) / 16
    roof = 2 * B ** 3 / t_mm / 1e12
    print(f"roofline {roof:.1f} TF/s bf16 "
          f"({'HEALTHY' if roof > 130 else 'THROTTLED'})")

    # f32-HIGH reference value for drift gates
    @jax.jit
    def check(X, m):
        kfn = rbf_block_fn(X, iw, var, noise)
        ld, quad = evidence_left_fast(
            kfn, N, m, Policy(base=256, bf16=False, leafinv=False,
                              stack=True))
        return quad + ld
    ref = sync(check(X, m))

    def chain(evfn):
        @jax.jit
        def pipe(X, m):
            def body(_, carry):
                acc, Xc = carry
                e = evfn(Xc, m)
                return acc + e, Xc + (e * 0.0)
            return jax.lax.fori_loop(0, reps, body,
                                     (jnp.zeros((), jnp.float32), X))[0]
        return pipe

    def measure(name, evfn):
        try:
            pipe = chain(evfn)
            v = sync(pipe(X, m))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            return None
        raws = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(pipe(X, m))
            raws.append(time.perf_counter() - t0)
        t = (min(raws) - rtt) / reps
        drift = abs(v / reps - ref) / abs(ref)
        print(f"{name}: {t*1e3:.2f} ms min3 "
              f"({sorted(r*1e3/reps for r in raws)}) drift {drift:.1e}")
        return t

    results = {}
    for mode in ("full", "leaf256", "span4", "leaf256+span4"):
        results[mode] = measure(
            f"panel-{mode}",
            lambda X, m, mode=mode: sum(evidence_panel_rbf(
                X, m, iw, var, noise, b=512, mode=mode)))
    results["flat"] = measure(
        "flat-b512",
        lambda X, m: sum(evidence_flat(
            rbf_block_fn(X, iw, var, noise), N, m,
            Policy(512, True, "xla", True))))
    if results.get("full") and results.get("flat"):
        print(f"panel_vs_flat ratio (mode full): "
              f"{results['full']/results['flat']:.4f}")
    best = min((t, k) for k, t in results.items() if t and k != "flat")
    print(f"best panel mode: {best[1]} at {best[0]*1e3:.2f} ms")

    # diag-mode residual cost (product-engine grad path)
    measure("panel-full+diag", lambda X, m: sum(evidence_panel_rbf(
        X, m, iw, var, noise, b=512, mode="full+diag")))

    # product engine forward: ragged N=16000 + bias split through the same
    # kernel (one extra RHS column)
    from gpc_tpu import kernels as GK
    from gpc_tpu.ops.panel_engine import kern_evidence_panel
    kern = GK.Cmpnd(input_dim=q, components=(
        GK.Rbf(input_dim=q), GK.Bias(input_dim=q), GK.White(input_dim=q)))
    Nr = 16000
    Xr = jnp.asarray(rng.standard_normal((Nr, q)), jnp.float32)
    mr = jnp.asarray(rng.standard_normal((Nr, D)), jnp.float32)
    p = jnp.asarray(np.array([1.0, 1.0, 0.1, 0.1]), jnp.float32)

    @jax.jit
    def eng_chain(p, Xr, mr):
        def body(_, carry):
            acc, Xc = carry
            ld, quad = kern_evidence_panel(kern, p, Xc, mr)
            e = ld + quad
            return acc + e, Xc + (e * 0.0)
        return jax.lax.fori_loop(0, reps, body,
                                 (jnp.zeros((), jnp.float32), Xr))[0]
    v = sync(eng_chain(p, Xr, mr))
    raws = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(eng_chain(p, Xr, mr))
        raws.append(time.perf_counter() - t0)
    t = (min(raws) - rtt) / reps
    print(f"panel ENGINE fwd (rbf+bias+white, ragged N=16000→16384): "
          f"{t*1e3:.2f} ms min3, value {v/reps:.4f}")

    # compiled-mode correctness sweep (same session)
    import tpu_panel_compiled_sweep
    rc = tpu_panel_compiled_sweep.main()
    print(f"compiled sweep exit {rc}")


if __name__ == "__main__":
    main()
