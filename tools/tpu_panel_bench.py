"""TPU batch: panel mega-kernel (v3) vs XLA flat vs v2 mega + overlap probes.

One session, everything chained/RTT-corrected (BASELINE.md methodology):
  1. RTT + bf16 matmul roofline (session health: ≳130 TF/s = healthy)
  2. In-kernel micro-probes: dot rate, leaf rate, VPU/MXU overlap, DMA rates
  3. evidence_panel_rbf N=16k b=512: full + slice modes, vs flat-b512 (XLA)
     and mega-b512 (v2) — all same-session
  4. Accuracy gate: panel vs f32-HIGH evidence
  5. N=65k matrix-free iterative evidence value+grad (VERDICT r3 #2)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def sync(x):
    return float(jnp.ravel(x)[0])


def main():
    @jax.jit
    def _t(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_t(one))
    rtt = min((lambda t0: (sync(_t(one)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(8))
    print(f"rtt={rtt*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    Bm = 8192
    A1 = jnp.asarray(rng.standard_normal((Bm, Bm)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((Bm, Bm)), jnp.bfloat16)

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
    t_mm = max(time.perf_counter() - t0 - rtt, 1e-9) / 16
    roof = 2 * Bm ** 3 / t_mm / 1e12
    print(f"roofline {roof:.1f} TF/s bf16"
          + ("  (HEALTHY)" if roof > 130 else "  (THROTTLED)"), flush=True)

    # ---- 2. overlap micro-probes -----------------------------------------
    import tools.tpu_overlap_probe as P
    slab = jnp.asarray(rng.standard_normal((2, P.RC, P.KC)), jnp.bfloat16)
    vrow = jnp.asarray(rng.standard_normal((P.B, P.KC)), jnp.bfloat16)
    aleaf = jnp.asarray(
        np.eye(P.B) * 50.0 + rng.standard_normal((P.B, P.B)) * 0.01,
        jnp.float32)
    ND, NL = 64, 8
    times = {}
    for name, nd, nl, inter in [("dots-only", ND, 0, False),
                                ("leaves-only", 0, NL, False),
                                ("sequential", ND, NL, False),
                                ("interleaved", ND, NL, True)]:
        try:
            run = P.make_probe(nd, nl, inter)
            sync(run(slab, vrow, aleaf))
            t0 = time.perf_counter()
            sync(run(slab, vrow, aleaf))
            t = max(time.perf_counter() - t0 - rtt, 1e-9)
            times[name] = t
            extra = ""
            if nd:
                extra = (f"  ({2*P.RC*P.KC*P.B*nd/t/1e12:.1f} TF/s, "
                         f"{t/nd*1e6:.1f} us/dot)")
            if name == "leaves-only":
                extra = f"  ({t/nl*1e6:.1f} us/leaf)"
            print(f"{name:12s} {t*1e3:7.2f} ms{extra}", flush=True)
        except Exception as e:
            print(f"{name} FAILED {type(e).__name__}: {str(e)[-180:]}",
                  flush=True)
    if len(times) == 4:
        print(f"  -> overlap: inter {times['interleaved']*1e3:.2f} vs "
              f"seq {times['sequential']*1e3:.2f} vs "
              f"dots+leaves {1e3*(times['dots-only']+times['leaves-only']):.2f}"
              f" vs max {1e3*max(times['dots-only'], times['leaves-only']):.2f} ms",
              flush=True)

    NCH = 64
    hbm = jnp.asarray(rng.standard_normal((NCH, P.RC, P.KC)), jnp.bfloat16)
    for with_dots in (False, True):
        try:
            run = P.make_dma_probe(NCH, with_dots)
            sync(run(hbm, vrow))
            t0 = time.perf_counter()
            sync(run(hbm, vrow))
            t = max(time.perf_counter() - t0 - rtt, 1e-9)
            lab = "dma+dots" if with_dots else "dma-only"
            print(f"{lab:12s} {t*1e3:7.2f} ms  "
                  f"({NCH*P.RC*P.KC*2/t/1e9:.0f} GB/s"
                  + (f", {2*P.RC*P.KC*P.B*NCH/t/1e12:.1f} TF/s)"
                     if with_dots else ")"), flush=True)
        except Exception as e:
            print(f"{lab} FAILED {type(e).__name__}: {str(e)[-180:]}",
                  flush=True)

    # ---- 3. N=16k evidence: panel vs flat vs mega ------------------------
    N, q = 16384, 8
    X = jnp.asarray(rng.standard_normal((N, q)), jnp.float32)
    mv = jnp.asarray(rng.standard_normal((N, 1)), jnp.float32)
    iw = jnp.float32(1.0)
    var = jnp.float32(1.0)
    noise = jnp.float32(0.1)
    reps = 8

    from gpc_tpu.ops.chol_panel import evidence_panel_rbf
    from chol_mega_v2 import evidence_mega_rbf
    from gpc_tpu.ops.evidence_fast import evidence_flat, Policy
    from gpc_tpu.ops.lazy_evidence import rbf_block_fn

    def chain(ev):
        @jax.jit
        def pipe(X, mv):
            def body(_, carry):
                acc, Xc = carry
                e = ev(Xc, mv)
                return acc + e, Xc + e * 0.0
            return lax.fori_loop(0, reps, body,
                                 (jnp.zeros((), jnp.float32), X))[0]
        return pipe

    def flat_ev(Xc, mv):
        kfn = rbf_block_fn(Xc, iw, var, noise)
        ld, qd = evidence_flat(kfn, N, mv, Policy(512, True, "xla", True))
        return ld + qd

    def mega_ev(Xc, mv):
        ld, qd = evidence_mega_rbf(Xc, mv, iw, var, noise, b=512)
        return ld + qd

    def panel_ev(mode):
        def ev(Xc, mv):
            ld, qd = evidence_panel_rbf(Xc, mv, iw, var, noise, b=512,
                                        mode=mode)
            return ld + qd
        return ev

    # f32-HIGH accuracy reference
    from gpc_tpu.ops.evidence_fast import evidence_left_fast

    @jax.jit
    def check(X, mv):
        kfn = rbf_block_fn(X, iw, var, noise)
        ld, qd = evidence_left_fast(
            kfn, N, mv, Policy(base=256, bf16=False, leafinv=False,
                               stack=True))
        return qd + ld
    ref = sync(check(X, mv))
    print(f"f32-HIGH evidence ref = {ref:.6f}", flush=True)

    flops = 2.0 * N * N * q + N ** 3 / 3.0 + 2.0 * N * N * 1
    cands = [("flat-b512", flat_ev), ("mega-b512", mega_ev),
             ("panel-full", panel_ev("full")),
             ("panel-fakeleaf", panel_ev("fakeleaf")),
             ("panel-nodot", panel_ev("nodot")),
             ("panel-nodma", panel_ev("nodma")),
             ("panel-nogram", panel_ev("nogram"))]
    for name, ev in cands:
        try:
            pipe = chain(ev)
            v = sync(pipe(X, mv))
            t0 = time.perf_counter()
            sync(pipe(X, mv))
            t = max(time.perf_counter() - t0 - rtt, 1e-9) / reps
            drift = abs(v / reps - ref) / abs(ref)
            gf = flops / t / 1e9
            print(f"{name:15s} {t*1e3:7.2f} ms  {gf/1e3:6.1f} TF/s = "
                  f"{gf/1e3/roof*100:5.1f}% roof  drift={drift:.1e}",
                  flush=True)
        except Exception as e:
            print(f"{name} FAILED {type(e).__name__}: {str(e)[-200:]}",
                  flush=True)

    # ---- 5. N=65k matrix-free iterative value+grad -----------------------
    try:
        from gpc_tpu import kernels as GK
        from gpc_tpu.ops.iterative import IterConfig, kern_evidence_iterative
        N2 = 65536
        X2 = jnp.asarray(rng.standard_normal((N2, 2)), jnp.float32)
        m2 = jnp.asarray(np.sin(np.asarray(X2)[:, :1]).astype(np.float32)
                         + 0.1 * rng.standard_normal((N2, 1)).astype(
                             np.float32))
        kern = GK.Cmpnd(input_dim=2, components=(
            GK.Rbf(input_dim=2), GK.Bias(input_dim=2), GK.White(input_dim=2)))
        p0 = jnp.asarray(np.array([1.0, 1.0, 0.135, 0.135]), jnp.float32)
        cfg = IterConfig(block=8192, probes=8, lanczos_iters=20, cg_iters=60,
                         precond_rank=0, trace_probes=8)

        def obj(p, Xl, ml):
            ld, qd = kern_evidence_iterative(kern, p, Xl, ml, cfg)
            return 0.5 * (qd + ld)

        vag = jax.jit(jax.value_and_grad(obj))
        t0 = time.perf_counter()
        v, g = vag(p0, X2, m2)
        sync(v)
        print(f"iter65k compile+first step {time.perf_counter()-t0:.1f}s "
              f"val={float(v):.3e} |g|={float(jnp.linalg.norm(g)):.3e}",
              flush=True)
        t0 = time.perf_counter()
        v, g = vag(p0, X2, m2)
        sync(v)
        t = max(time.perf_counter() - t0 - rtt, 1e-9)
        print(f"iter65k value+grad step {t*1e3:.0f} ms "
              f"(cg={cfg.cg_iters}, slq={cfg.probes}x{cfg.lanczos_iters}, "
              f"T={cfg.trace_probes})", flush=True)
    except Exception as e:
        print(f"iter65k FAILED {type(e).__name__}: {str(e)[-250:]}",
              flush=True)


if __name__ == "__main__":
    main()
