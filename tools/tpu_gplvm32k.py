"""TPU probe: N=32,768 GP-LVM training step on ONE chip.

32× the reference C++ GP-LVM's practical ceiling (~1k points,
/root/reference/README.md:412-414).  Rides the lazy fused evidence with the
prestacked-corr schedule (node-level ancestor arrays — O(N²·log) autodiff
residuals instead of per-block stacked operands) and a 1024 base block to
keep the unrolled trace manageable.  f32-HIGH (bf16 is outside its domain
on latent geometry, see ROADMAP round 3).
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


_PINS = {"GPC_TPU_EVIDENCE": "lazy", "GPC_TPU_EVIDENCE_BASE": "1024",
         "GPC_TPU_EVIDENCE_PRESTACK": "1"}


def main():
    # env pins saved/restored around the run (never mutated at import —
    # a shared interpreter must not inherit base=1024/prestack=1)
    saved = {k: os.environ.get(k) for k in _PINS}
    os.environ.update(_PINS)
    try:
        _main_inner()
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _main_inner():
    from gpc_tpu import kernels as K
    from gpc_tpu.models.gplvm import GPLVM, log_likelihood

    N, D, q = 32768, 4, 2
    rng = np.random.default_rng(0)
    Z = rng.standard_normal((N, q))
    W = rng.standard_normal((q, D))
    y = np.tanh(Z @ W) + 0.1 * rng.standard_normal((N, D))

    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
    t0 = time.perf_counter()
    model = GPLVM(kern, y, latent_dim=q)
    print(f"init (PCA on N=32k): {time.perf_counter()-t0:.1f}s", flush=True)

    spec = model.spec
    yj = jnp.asarray(y, jnp.float32)
    bias = jnp.asarray(model.noise_bias, jnp.float32)
    fs = jnp.asarray(model.fixed_scales, jnp.float32)
    theta = jnp.asarray(model.theta, jnp.float32)

    @jax.jit
    def _t(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_t(one))
    rtt = min((lambda s: (sync(_t(one)), time.perf_counter() - s)[1])(
        time.perf_counter()) for _ in range(8))
    print(f"rtt={rtt*1e3:.1f} ms", flush=True)

    reps = 3

    @jax.jit
    def chain(t):
        def body(_, carry):
            acc, tc = carry
            v, g = jax.value_and_grad(
                lambda th: -log_likelihood(spec, th, yj, bias, fs))(tc)
            return acc + v, tc + 0.0 * g
        return jax.lax.fori_loop(0, reps, body,
                                 (jnp.zeros((), jnp.float32), t))[0]

    t0 = time.perf_counter()
    v = sync(chain(theta))
    print(f"compile+first: {time.perf_counter()-t0:.0f}s acc_nlml={v:.1f}",
          flush=True)
    assert np.isfinite(v), "non-finite objective"
    t0 = time.perf_counter()
    sync(chain(theta))
    t = max(time.perf_counter() - t0 - rtt, 1e-9) / reps
    print(f"N=32768 GP-LVM value+grad step ({theta.size} params incl. "
          f"{N*q} latents): {t*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
