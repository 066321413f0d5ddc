"""TPU timing: N=16k GP-LVM training step on one chip.

The reference GP-LVM stops at ~1k points (README.md:412-414, 'overnight' for
N=1000).  Here one SCG value+grad step of the N=16384 GP-LVM NLML — evidence
fused through ops/lazy_evidence.kern_evidence_lazy, differentiated by
jax.grad including all N·q latent coordinates — is timed on the real chip.

GPC_TPU_BF16_EVIDENCE=1 opts the O(N³) update GEMMs into bf16/f32-accum.
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

    vag = jax.jit(jax.value_and_grad(
        lambda t: -log_likelihood(spec, t, yj, bias, fs)))
    theta = jnp.asarray(model.theta, jnp.float32)

    t0 = time.perf_counter()
    v, g = vag(theta)
    v0 = float(v)
    print(f"compile+first step: {time.perf_counter()-t0:.0f}s  "
          f"nlml={v0:.1f}", flush=True)
    assert np.isfinite(v0)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = vag(theta)
        sync(g)
    t = (time.perf_counter() - t0) / reps
    gn = float(jnp.linalg.norm(g))
    print(f"value+grad step (N=16384, {theta.size} params incl. "
          f"{N*q} latents): {t*1e3:.0f} ms  |g|={gn:.3g}", flush=True)

    # a few SCG-like gradient-descent steps to show training moves
    a = theta
    lr = 1e-6
    for i in range(3):
        v, g = vag(a)
        a = a - lr * g
        print(f"  step {i}: nlml={float(v):.1f}", flush=True)


if __name__ == "__main__":
    main()
