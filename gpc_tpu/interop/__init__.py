from gpc_tpu.interop.fgp import fgp, clear, query, retrain, train  # noqa: F401
