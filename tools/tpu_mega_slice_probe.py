"""TPU probe: mega-kernel per-component attribution via slice modes.

Runs evidence_mega_rbf at N=16k b=512 in each slicing mode (chol_mega):
  full    — the real kernel
  noleaf  — diagonal-factor stand-in        (full − noleaf  = leaf chain)
  nodot   — row DMAs kept, wide dots skipped (full − nodot  = Schur dots)
  nodma   — dots against the resident rowj   (full − nodma  = rowi stream)
  nogram  — exp map skipped                  (full − nogram = Gram epilogue)
RTT-corrected, 8 chained reps per timing.
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
    from chol_mega_v2 import evidence_mega_rbf

    @jax.jit
    def _t(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_t(one))
    rtt = min((lambda t0: (sync(_t(one)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(8))
    print(f"rtt={rtt*1e3:.1f} ms", flush=True)

    N, q = 16384, 8
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((N, q)), jnp.float32)
    mv = jnp.asarray(rng.standard_normal((N, 1)), jnp.float32)
    reps = 8
    base = {}
    for mode in ("full", "noleaf", "nodot", "nodma", "nogram"):
        @jax.jit
        def pipe(X, mv, mode=mode):
            def body(_, carry):
                acc, Xc = carry
                ld, qd = evidence_mega_rbf(
                    Xc, mv, jnp.float32(1.0), jnp.float32(1.0),
                    jnp.float32(0.1), b=512, mode=mode)
                e = ld + qd
                return acc + e, Xc + e * 0.0
            return lax.fori_loop(0, reps, body,
                                 (jnp.zeros((), jnp.float32), X0))[0]
        try:
            sync(pipe(X0, mv))
            t0 = time.perf_counter()
            sync(pipe(X0, mv))
            t = max(time.perf_counter() - t0 - rtt, 1e-9) / reps
            base[mode] = t
            print(f"mega-{mode}: {t*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"mega-{mode} FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    if "full" in base:
        f = base["full"]
        for mode, label in (("noleaf", "leaf chain"),
                            ("nodot", "Schur dots"),
                            ("nodma", "rowi DMA stream"),
                            ("nogram", "Gram exp epilogue")):
            if mode in base:
                print(f"attribution {label}: {(f-base[mode])*1e3:+.2f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
