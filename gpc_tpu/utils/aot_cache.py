"""AOT program cache: skip trace+lower on warm CLI runs via jax.export.

At reference-tutorial sizes the persistent XLA compilation cache removes the
compile step, but JAX still re-traces the Python objective and re-lowers it
to StableHLO every run (~0.7 s for the sinc SCG program) just to compute the
cache key.  This module snapshots the whole jitted program with `jax.export`
the first time a (structure, data, shapes) key is seen, and on warm runs
deserializes it (~1 ms) and calls it directly — the underlying XLA compile
then hits the persistent cache.  The reference binaries have no analogue
(they are AOT by construction); this is the piece that makes warm
`gp learn sinc` wall-clock approach the C++ oracle minus the Python/JAX
interpreter startup floor (~2 s, measured).

Every failure path falls back to the normal trace path — the cache is an
optimization, never a failure mode.

OPT-IN (GPC_TPU_AOT_CACHE=1): on this image, executing a deserialized
exported program whose XLA compile hit the PERSISTENT XLA:CPU cache
segfaults inside the CPU AOT loader (the cpu_aot_loader.cc machine-feature
mismatch it warns about); the same program runs correctly when the
persistent cache is off or when traced normally.  Until that loader is
fixed upstream, the trace-skip stays opt-in — the persistent compilation
cache alone already removes the dominant warm-run cost (cli/common).
"""

from __future__ import annotations

import hashlib
import os


def enabled() -> bool:
    return os.environ.get("GPC_TPU_AOT_CACHE", "0") == "1"


def _dir():
    d = os.environ.get(
        "GPC_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gpc_tpu", "xla"))
    if not d or d == "0":
        return None
    d = os.path.join(d, "aot")
    os.makedirs(d, exist_ok=True)
    return d


_REGISTERED = False


def _register_pytrees(jexport):
    """Register the result namedtuples that cross the export boundary."""
    global _REGISTERED
    if _REGISTERED:
        return
    from gpc_tpu.optim.scg import ScgResult

    try:
        jexport.register_namedtuple_serialization(
            ScgResult, serialized_name="gpc_tpu.ScgResult")
    except ValueError:
        pass  # already registered in this process
    _REGISTERED = True


def digest(*parts) -> str:
    """Stable content key: arrays by raw bytes, everything else by repr."""
    import numpy as np

    h = hashlib.sha256()
    for p in parts:
        if hasattr(p, "dtype"):
            a = np.asarray(p)
            h.update(str(a.dtype).encode())
            h.update(str(a.shape).encode())
            h.update(np.ascontiguousarray(a).tobytes())
        else:
            h.update(repr(p).encode())
        h.update(b"|")
    return h.hexdigest()[:32]


def call_exported(key: str, make_jit_fn, example_args):
    """Run `make_jit_fn()(*example_args)` through the export cache.

    key: content digest of everything that shapes the program EXCEPT
    example_args' values (their shapes/dtypes are appended automatically).
    Returns the result pytree, or None if the cache machinery failed and the
    caller should take the normal path.
    """
    if not enabled():
        return None
    root = _dir()
    if root is None:
        return None
    try:
        import jax
        from jax import export as jexport

        _register_pytrees(jexport)
        full = digest(key, jax.__version__, jax.default_backend(),
                      *[(str(getattr(a, "dtype", type(a))),
                         str(getattr(a, "shape", ()))) for a in example_args])
        path = os.path.join(root, full + ".jaxexp")
        if os.path.exists(path):
            with open(path, "rb") as f:
                exp = jexport.deserialize(f.read())
            return exp.call(*example_args)
        fn = make_jit_fn()
        out = fn(*example_args)
        blob = jexport.export(fn)(*example_args).serialize()
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return out
    except Exception:
        return None
