"""TPU timing: N=16k GP-LVM training step on one chip, per evidence mode.

The reference GP-LVM stops at ~1k points (README.md:412-414, 'overnight' for
N=1000).  Here one SCG value+grad step of the N=16384 GP-LVM NLML — including
all N·q latent-coordinate gradients — is timed on the real chip for each
evidence engine (GPC_TPU_EVIDENCE):

  lazy       — fused lazy factorization, gradients via jax.grad through the
               recursion (141 ms measured with this methodology; the r2
               record of 531 ms was RTT-inflated);
  lazy+bf16  — rides the rank-1 bias Woodbury split; still NaNs on THIS
               workload (the 2-D latent geometry's λmax ≫ ridge is outside
               any 1-pass-bf16 domain — measured, ROADMAP round 3);
  fastgrad   — same forward, analytic custom VJP (ops/evidence_grad;
               measured 625 ms at f32-HIGH — lazy autodiff wins).

The evidence-mode env vars are saved and restored around main().

RTT methodology: the axon value fetch costs a full round trip (26-62 ms);
measured via trivial syncs (min of 8) and subtracted; steps are chained so
each rep depends on the previous.
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
    from gpc_tpu import kernels as K
    from gpc_tpu.models.gplvm import GPLVM, log_likelihood

    saved_env = {k: os.environ.get(k)
                 for k in ("GPC_TPU_EVIDENCE", "GPC_TPU_BF16_EVIDENCE")}
    try:
        _main_inner(K, GPLVM, log_likelihood)
    finally:
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _main_inner(K, GPLVM, log_likelihood):

    N, D, q = 16384, 4, 2
    rng = np.random.default_rng(0)
    # low-dimensional structure + noise, the GP-LVM's native setting
    Z = rng.standard_normal((N, q))
    W = rng.standard_normal((q, D))
    y = np.tanh(Z @ W) + 0.1 * rng.standard_normal((N, D))

    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
    t0 = time.perf_counter()
    model = GPLVM(kern, y, latent_dim=q)
    print(f"init (PCA on N=16k): {time.perf_counter()-t0:.1f}s", flush=True)

    spec = model.spec
    yj = jnp.asarray(y, jnp.float32)
    bias = jnp.asarray(model.noise_bias, jnp.float32)
    fs = jnp.asarray(model.fixed_scales, jnp.float32)
    theta = jnp.asarray(model.theta, jnp.float32)

    @jax.jit
    def _triv(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_triv(one))
    rtt = min(_t_one(_triv, one) for _ in range(8))
    print(f"rtt={rtt*1e3:.1f} ms", flush=True)

    reps = 5
    # lazy+bf16 rides the rank-1 bias Woodbury split (lazy_evidence.bias_split)
    # — without it the bf16 factorization NaNs on this kernel family
    for mode, bf16 in (("lazy", "0"), ("lazy", "1")):  # fastgrad removed r5
        os.environ["GPC_TPU_EVIDENCE"] = mode
        os.environ["GPC_TPU_BF16_EVIDENCE"] = bf16

        def step_chain(t):
            def body(_, carry):
                acc, tc = carry
                v, g = jax.value_and_grad(
                    lambda th: -log_likelihood(spec, th, yj, bias, fs))(tc)
                return acc + v, tc + 0.0 * g
            return jax.lax.fori_loop(0, reps, body,
                                     (jnp.zeros((), jnp.float32), t))[0]

        pipe = jax.jit(step_chain)
        tag = f"{mode}{'+bf16' if bf16 == '1' else ''}"
        try:
            t0 = time.perf_counter()
            v = sync(pipe(theta))
            print(f"{tag}: compile+first {time.perf_counter()-t0:.0f}s "
                  f"acc_nlml={v:.1f}", flush=True)
            if not np.isfinite(v):
                print(f"{tag}: NON-FINITE, skipping timing", flush=True)
                continue
            t0 = time.perf_counter()
            sync(pipe(theta))
            t = max(time.perf_counter() - t0 - rtt, 1e-9) / reps
            print(f"{tag}: value+grad step (N=16384, {theta.size} params "
                  f"incl. {N*q} latents): {t*1e3:.0f} ms", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


def _t_one(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
