"""One TPU session: leaf-inverse (GPC_TPU_PALLAS_BASE) evidence vs default.

Times, within a single axon session (only within-session ratios meaningful):
  - bf16 matmul roofline anchor
  - fused evidence sweep, default recursion (XLA base chol + triangular_solve)
  - fused evidence sweep, Pallas chol+inv leaves (all solves as GEMMs)
and reports the max-rel numerical difference between the two factors.
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


def timeit(fn, *a, reps=5):
    sync(fn(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    N, q, D = 16384, 8, 1
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, q)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    mm = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    t = timeit(mm, A1, A2, reps=10)
    print(f"matmul bf16 {B}: {t*1e3:.2f} ms = {2*B**3/t/1e12:.1f} TFLOP/s",
          flush=True)

    @jax.jit
    def gram(X):
        n2 = jnp.sum(X * X, axis=1, keepdims=True)
        d2 = jnp.maximum(n2 + n2.T - 2.0 * (X @ X.T), 0.0)
        return jnp.exp(-0.5 * d2) + 1e-2 * jnp.eye(N, dtype=jnp.float32)

    t_g = timeit(gram, X)
    print(f"gram XLA-fused: {t_g*1e3:.2f} ms", flush=True)
    K = gram(X)
    sync(K)

    import gpc_tpu.ops.chol_blocked as cb

    results = {}
    for flag in ("0", "1"):
        os.environ["GPC_TPU_PALLAS_BASE"] = flag
        import importlib
        importlib.reload(cb)
        ev = jax.jit(lambda K, m: cb.evidence_fused(K, m)[0]
                     + cb.evidence_fused(K, m)[1])
        # time just one fused sweep (jit dedups the double call)
        ev1 = jax.jit(lambda K, m: sum(cb.evidence_fused(K, m)[:2]))
        t_e = timeit(ev1, K, m)
        chol_tf = N ** 3 / 3 / t_e / 1e12
        print(f"evidence_fused PALLAS_BASE={flag}: {t_e*1e3:.1f} ms "
              f"(chol-equiv {chol_tf:.1f} TFLOP/s)", flush=True)
        results[flag] = (t_e, np.asarray(jax.jit(cb.cholesky)(K)))
        t_c = timeit(jax.jit(lambda K: cb.cholesky(K)), K)
        print(f"cholesky    PALLAS_BASE={flag}: {t_c*1e3:.1f} ms "
              f"= {N**3/3/t_c/1e12:.1f} TFLOP/s", flush=True)
    os.environ.pop("GPC_TPU_PALLAS_BASE")

    L0, L1 = results["0"][1], results["1"][1]
    denom = np.max(np.abs(L0))
    print(f"factor maxrel diff pallas-vs-default: "
          f"{np.max(np.abs(L0 - L1))/denom:.2e}", flush=True)
    sp = results["0"][0] / results["1"][0]
    print(f"speedup from leaf-inverse path: {sp:.2f}x", flush=True)


if __name__ == "__main__":
    main()
