"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Parity tests against the reference (MATCHTOL-style tolerances, SURVEY.md §4) need
float64; multi-device sharding tests (tests/test_parallel.py) need a virtual mesh.
Both must be configured before jax initializes its backends, hence the env vars at
import time.  Benchmarks (bench.py) run separately on real TPU in float32.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (remote TPU tunnel,
# no float64, minutes-long first-use session claim), and the axon sitecustomize
# additionally calls jax.config.update("jax_platforms", "axon,cpu") at interpreter
# start — so the env var alone is not enough; the config must be re-updated after
# importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
