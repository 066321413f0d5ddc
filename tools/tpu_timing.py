"""One consolidated TPU timing session: Pallas Gram, bf16 Cholesky, pipeline.

Usage: python tools/tpu_timing.py  (runs on the axon TPU; ~8 min session claim
on first op).  All numbers are within-session comparable only (shared pool).
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


def timeit(fn, *a, reps=5, **k):
    sync(fn(*a, **k))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **k)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}", flush=True)
    N, q = 16384, 8
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, q)), jnp.float32)
    params = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)

    # roofline anchor
    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    mm = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    t = timeit(mm, A1, A2, reps=10)
    print(f"matmul bf16 {B}: {t*1e3:.2f} ms = {2*B**3/t/1e12:.1f} TFLOP/s", flush=True)

    # XLA-fused rbf Gram
    @jax.jit
    def gram_xla(X):
        n2 = jnp.sum(X * X, axis=1, keepdims=True)
        d2 = jnp.maximum(n2 + n2.T - 2.0 * (X @ X.T), 0.0)
        return jnp.exp(-0.5 * d2)
    t_xla = timeit(gram_xla, X)
    print(f"gram XLA-fused N={N}: {t_xla*1e3:.2f} ms", flush=True)

    # Pallas fused Gram
    from gpc_tpu.ops.gram_pallas import dist_gram
    for tile in (256, 512):
        try:
            t_pal = timeit(lambda X: dist_gram("rbf", params, X, X, tile=tile), X)
            print(f"gram pallas tile={tile}: {t_pal*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"gram pallas tile={tile} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    # Cholesky variants
    K = gram_xla(X) + 1e-2 * jnp.eye(N, dtype=jnp.float32)
    K = jax.block_until_ready(K)
    t_x = timeit(jax.jit(jnp.linalg.cholesky), K)
    print(f"chol XLA N={N}: {t_x*1e3:.1f} ms = {N**3/3/t_x/1e12:.1f} TFLOP/s",
          flush=True)
    from gpc_tpu.ops.chol_blocked import cholesky as blocked
    t_b = timeit(jax.jit(blocked), K)
    print(f"chol blocked f32: {t_b*1e3:.1f} ms = {N**3/3/t_b/1e12:.1f} TFLOP/s",
          flush=True)
    os.environ["GPC_TPU_BF16_CHOL"] = "1"
    import importlib
    import gpc_tpu.ops.chol_blocked as cb
    importlib.reload(cb)
    t_bf = timeit(jax.jit(cb.cholesky), K)
    L_bf = cb.cholesky(K)
    L_f = blocked(K)
    err = float(jnp.max(jnp.abs(L_bf - L_f)) / jnp.max(jnp.abs(L_f)))
    print(f"chol blocked bf16-GEMM: {t_bf*1e3:.1f} ms = "
          f"{N**3/3/t_bf/1e12:.1f} TFLOP/s  maxrel-vs-f32 {err:.2e}", flush=True)
    os.environ.pop("GPC_TPU_BF16_CHOL")
    importlib.reload(cb)

    # fused evidence pipeline with pallas gram vs xla gram
    m = jnp.asarray(rng.standard_normal((N, 1)), jnp.float32)

    def evidence(gram_fn, X, m):
        K = gram_fn(X) + 1e-2 * jnp.eye(N, dtype=jnp.float32)
        L = blocked(K)
        v = jax.scipy.linalg.solve_triangular(L, m, lower=True)
        return jnp.sum(v * v) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    t_e1 = timeit(jax.jit(lambda X, m: evidence(gram_xla, X, m)), X, m)
    print(f"evidence XLA-gram: {t_e1*1e3:.1f} ms", flush=True)
    try:
        t_e2 = timeit(jax.jit(lambda X, m: evidence(
            lambda X: dist_gram("rbf", params, X, X), X, m)), X, m)
        print(f"evidence pallas-gram: {t_e2*1e3:.1f} ms", flush=True)
    except Exception as e:
        print(f"evidence pallas-gram FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
