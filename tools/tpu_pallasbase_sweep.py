"""One TPU session: PALLAS_BASE × BF16 updates × BASE-size sweep at N=16k.

Follow-up to tools/tpu_pallasbase_timing.py — with the leaf factorizations
off the critical path, the GEMM updates may become bf16-worthy and the
optimal BASE may shift.  Prints evidence-sweep times for each combination
(within-session ratios only).
"""

import os
import sys
import time
import importlib

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

    K = gram(X)
    sync(K)

    # direct leaf-kernel correctness probe on real hardware (interpret mode
    # on CPU passed; Mosaic must agree)
    from gpc_tpu.ops.chol_pallas import chol_inv_block
    Kb = K[:256, :256]
    L, M = chol_inv_block(Kb)
    Lh, Mh = np.asarray(L), np.asarray(M)
    Lw = np.linalg.cholesky(np.asarray(Kb, np.float64))
    print(f"leaf L err {np.max(np.abs(Lh - Lw)):.2e}  "
          f"M@L-I err {np.max(np.abs(Mh @ Lh - np.eye(256))):.2e}", flush=True)

    import gpc_tpu.ops.chol_blocked as cb

    combos = [
        ("default f32", "0", "0", 256),
        ("pallas256", "1", "0", 256),
        ("pallas256+bf16", "1", "1", 256),
        ("pallas512", "1", "0", 512),
        ("pallas128", "1", "0", 128),
    ]
    for name, pb, bf, base in combos:
        os.environ["GPC_TPU_PALLAS_BASE"] = pb
        os.environ["GPC_TPU_BF16_CHOL"] = bf
        importlib.reload(cb)
        cb.BASE = base
        try:
            ev = jax.jit(lambda K, m: sum(cb.evidence_fused(K, m)[:2]))
            t_e = timeit(ev, K, m)
            print(f"evidence {name:16s}: {t_e*1e3:6.1f} ms "
                  f"(chol-equiv {N**3/3/t_e/1e12:.1f} TFLOP/s)", flush=True)
        except Exception as e:
            print(f"evidence {name:16s}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    os.environ.pop("GPC_TPU_PALLAS_BASE", None)
    os.environ.pop("GPC_TPU_BF16_CHOL", None)


if __name__ == "__main__":
    main()
