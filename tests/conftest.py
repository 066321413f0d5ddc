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
# No persistent compilation cache inside the test process: this image's
# XLA:CPU executable (de)serialization is fragile — observed as a
# nondeterministic hard abort in put_executable_and_time (and a SIGILL
# reading entries compiled on a wider-ISA pool host) once a CLI test calls
# cli/common.setup_jax and enables the cache PROCESS-WIDE.  Within one
# pytest process the in-memory jit cache already dedups, so the persistent
# cache buys nothing here; the CLIs keep it (cli/common.py, machine-keyed).
os.environ.setdefault("GPC_TPU_CACHE_DIR", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test MODULES.

    This image's XLA:CPU JIT segfaults inside backend_compile after a few
    hundred accumulated compiled programs in one process (reproduced at the
    same suite position across runs, with the persistent cache disabled;
    the same tests pass in a fresh process).  Dropping executables at
    module boundaries keeps the live-program count bounded; cross-module
    cache reuse is negligible, so the runtime cost is small."""
    yield
    import jax as _jax
    _jax.clear_caches()
