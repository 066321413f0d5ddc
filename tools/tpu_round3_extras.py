"""TPU probe: the three round-3 tracked-surface metrics (VERDICT r2 #6).

Measures, on the real chip, with RTT subtraction and rep chaining:
  (a) sparse DTC evidence+grad at N=16384, M=1024 (the sparse training step);
  (b) the N=16384 GP-LVM value+grad step per evidence mode (lazy vs
      fastgrad vs fastgrad+bf16) — r2 measured 531 ms on the lazy path;
  (c) IVM selection throughput: jitted select_points at N=4096, d=512.

The measured healthy-session numbers become the vs_baseline anchors for the
corresponding bench.py metrics (recorded in BASELINE.md).
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


def measure_rtt():
    @jax.jit
    def _triv(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_triv(one))
    samples = []
    for _ in range(8):
        t0 = time.perf_counter()
        sync(_triv(one))
        samples.append(time.perf_counter() - t0)
    return min(samples)


def time_chained(pipe, args, reps, rtt, tag):
    t0 = time.perf_counter()
    v = sync(pipe(*args))
    print(f"{tag}: compile+first {time.perf_counter()-t0:.0f}s val={v:.4g}",
          flush=True)
    if not np.isfinite(v):
        print(f"{tag}: NON-FINITE", flush=True)
        return None
    t0 = time.perf_counter()
    sync(pipe(*args))
    t = max(time.perf_counter() - t0 - rtt, 1e-9) / reps
    print(f"{tag}: {t*1e3:.1f} ms/step", flush=True)
    return t


def main():
    from gpc_tpu import kernels as K
    rtt = measure_rtt()
    print(f"rtt={rtt*1e3:.1f} ms", flush=True)
    reps = 8

    # (a) sparse DTC evidence+grad, N=16384 M=1024
    from gpc_tpu.models.gp import GP, make_objective
    N, M, q = 16384, 1024, 8
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, q)).astype(np.float32)
    y = np.sin(X[:, :1]).astype(np.float32)
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
    model = GP(kern, X, y, approx="dtc", num_active=M, centre=True, seed=0)
    nlml = make_objective(model.spec, X, y, model.bias, model.fixed_scales,
                          X_u_fixed=None)
    theta = jnp.asarray(model.theta, jnp.float32)

    @jax.jit
    def dtc_chain(t):
        def body(_, carry):
            acc, tc = carry
            v, g = jax.value_and_grad(nlml)(tc)
            return acc + v, tc + 0.0 * g
        return jax.lax.fori_loop(0, reps, body,
                                 (jnp.zeros((), jnp.float32), t))[0]
    time_chained(dtc_chain, (theta,), reps, rtt, f"dtc N={N} M={M} vag")

    # (b) GPLVM-16k step per evidence mode
    import tools.tpu_gplvm16k as g16
    g16.main()

    # (c) IVM selection throughput
    from gpc_tpu.models.ivm import IvmSpec, select_points
    from gpc_tpu.noise import GaussianNoise
    Ni, d = 4096, 512
    Xi = rng.standard_normal((Ni, 2)).astype(np.float32)
    yi = np.sin(2 * Xi[:, :1]).astype(np.float32)
    noise = GaussianNoise(output_dim=1)
    spec = IvmSpec(kern=K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2), K.Bias(input_dim=2), K.White(input_dim=2))),
        noise=noise, n_data=Ni, input_dim=2, output_dim=1, num_active=d)
    kp = jnp.asarray(spec.kern.default_params(), jnp.float32)
    npar = jnp.asarray(noise.default_params(yi), jnp.float32)
    rv = jnp.zeros((d,), jnp.float32)

    @jax.jit
    def sel(kp):
        st = select_points(spec, kp, npar, Xi, yi, rv)
        return st.varsigma.sum()
    t0 = time.perf_counter()
    sync(sel(kp))
    print(f"ivm select N={Ni} d={d}: compile+first "
          f"{time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    sync(sel(kp))
    t = max(time.perf_counter() - t0 - rtt, 1e-9)
    print(f"ivm select: {t*1e3:.0f} ms = {d/t:.0f} points/s", flush=True)


if __name__ == "__main__":
    main()
