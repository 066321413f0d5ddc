"""N=262,144 matrix-free FTC evidence value+grad on ONE chip.

Doubles the round-5 scale record again (N=131,072 at 15.89 s/step,
tools/tpu_131k.py) with the same GPC_TPU_EVIDENCE=iterative engine
(ops/iterative.py: CG quad + SLQ logdet, custom VJP, O(N·block) memory).
The reference's practical FTC ceiling is N≈1k
(/root/reference/README.md:412-414) — this is ~260× past it.  The MVM is
O(N²·chain) so ~4× the 131k step time is expected; the block drops
8192 → 4096 to keep the per-block (block, N) Gram tile at 4.3 GB f32
within the v5e's 16 GB HBM alongside the CG state.

Usage: python tools/tpu_262k.py [N] [block]
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


def main():
    jax.config.update("jax_platforms", "axon,cpu")
    assert jax.default_backend() not in ("cpu",)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    @jax.jit
    def _t(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_t(one))
    rtt = min((lambda t0: (sync(_t(one)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(8))
    print(f"rtt={rtt*1e3:.1f} ms", flush=True)

    from gpc_tpu import kernels as GK
    from gpc_tpu.ops.iterative import IterConfig, kern_evidence_iterative
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, 2)), jnp.float32)
    m = jnp.asarray(np.sin(np.asarray(X)[:, :1]).astype(np.float32)
                    + 0.1 * rng.standard_normal((N, 1)).astype(np.float32))
    kern = GK.Cmpnd(input_dim=2, components=(
        GK.Rbf(input_dim=2), GK.Bias(input_dim=2), GK.White(input_dim=2)))
    p0 = jnp.asarray(np.array([1.0, 1.0, 0.135, 0.135]), jnp.float32)
    cfg = IterConfig(block=block, probes=8, lanczos_iters=20, cg_iters=60,
                     precond_rank=0, trace_probes=8)

    def obj(p, Xl, ml):
        ld, qd = kern_evidence_iterative(kern, p, Xl, ml, cfg)
        return 0.5 * (qd + ld)

    vag = jax.jit(jax.value_and_grad(obj))
    t0 = time.perf_counter()
    v, g = vag(p0, X, m)
    v0 = sync(v)
    print(f"first step (incl. compile): {time.perf_counter()-t0:.1f} s, "
          f"value {v0:.2f}, grad finite {np.isfinite(np.asarray(g)).all()}",
          flush=True)
    assert np.isfinite(v0)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        sync(vag(p0, X, m)[0])
        ts.append(time.perf_counter() - t0 - rtt)
    print(f"N={N} value+grad: {min(ts):.2f} s/step min2 "
          f"({[round(t, 2) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
