"""MATLAB .mat model-file interop — the _NDLMATLAB CMatInterface counterpart.

The reference, built with _NDLMATLAB, can write/read its objects as MATLAB
structs in GPmat's layout (CNdlInterfaces.h:191-446; CGp::toMxArray/
fromMxArray CGp.cpp:1436-1521; CKern::toMxArray CKern.cpp — leaf kernels as
structs with named parameter fields, cmpnd as a `comp` cell of children;
noise structs CNoise.cpp).  This module reproduces that interop through
scipy.io: a gp model saves as the four variables GPmat and testGp.cpp use —
`gpInfo` (the CGp struct), `kern`, `noise`, and the transformed optimizer
vector `params` — so MATLAB GPmat and this framework can exchange fitted
models.  Data-file .mat reading lives in cli/common (`-f 1`).

Layout notes (matching /root/reference/matfiles fixtures):
  leaf kern   : type, inputDimension, nParams, isStationary, transforms
                (struct array of 1-based index + transform type), one named
                field per parameter (e.g. inverseWidth, variance), index
                (position inside a compound).
  cmpnd/tensor: type, inputDimension, nParams, comp (1×k cell of children),
                whiteVariance.
  noise       : type, numProcess, numData, nParams, spherical, logconcave,
                missing, bias, sigma2 (+ gamma/width for ncnm, widths for
                ordered).
  gpInfo      : type='gp', approx, learnScales, d, q, N, k, fixInducing,
                X_u, beta, betaTransform, scale, bias  (CGp.cpp:1436-1485).
"""

from __future__ import annotations

import numpy as np

from gpc_tpu import kernels as KM
from gpc_tpu import transforms as TR

_TRANSFORM_NAMES = {0: "none", 1: "exp", 2: "negLogLogit", 3: "sigmoid",
                    4: "linear"}
_TRANSFORM_CODES = {v: k for k, v in _TRANSFORM_NAMES.items()}


def _transforms_struct(kern):
    """GPmat `transforms` field: struct array of (index, type) for every
    non-linear-transformed parameter, 1-based indices."""
    codes = np.asarray(kern.transform_codes())
    entries = [(i + 1, _TRANSFORM_NAMES[int(c)]) for i, c in enumerate(codes)
               if int(c) != 0]
    arr = np.zeros((1, len(entries)),
                   dtype=[("index", object), ("type", object)])
    for j, (idx, name) in enumerate(entries):
        arr[0, j] = (float(idx), name)
    return arr


def kern_to_struct(kern: KM.Kern, params, index=None) -> dict:
    params = np.asarray(params, dtype=np.float64)
    if kern.kind in ("cmpnd", "tensor"):
        off = kern.offsets()
        comp = np.empty((1, len(kern.components)), dtype=object)
        for i, child in enumerate(kern.components):
            comp[0, i] = kern_to_struct(child, params[off[i]:off[i + 1]],
                                        index=i + 1)
        return {
            "type": kern.kind,
            "inputDimension": float(kern.input_dim),
            "nParams": float(kern.n_params),
            "comp": comp,
            "whiteVariance": float(kern.white(params)),
        }
    s = {
        "type": kern.kind,
        "inputDimension": float(kern.input_dim),
        "nParams": float(kern.n_params),
        "isStationary": float(getattr(kern, "stationary", False)),
        "transforms": _transforms_struct(kern),
    }
    if kern.kind == "whitefixed":
        s["variance"] = float(kern.fixed_variance)
        return s
    names = kern.param_names()
    # ARD kernels: the input scales collapse into one `inputScales` vector
    n_named = len([n for n in names if not n.startswith("inputScale")])
    for i, name in enumerate(names[:n_named]):
        s[name] = float(params[i])
    if n_named < len(names):
        s["inputScales"] = params[n_named:].reshape(1, -1)
    if kern.kind in ("poly", "polyard"):
        s["degree"] = float(kern.degree)
    if index is not None:
        s["index"] = float(index)
    return s


def _field(s, name, default=None):
    if s.dtype.names and name in s.dtype.names:
        v = s[name][0, 0] if s.ndim == 2 else s[name]
        return v
    if default is not None:
        return default
    raise KeyError(name)


def _scalar(s, name, default=None):
    v = _field(s, name, default)
    if isinstance(v, (int, float)):
        return float(v)
    return float(np.asarray(v).ravel()[0])


def _string(s, name):
    return str(np.asarray(_field(s, name)).ravel()[0])


def kern_from_struct(s):
    """Returns (kern, params) from a GPmat kern struct (loadmat, squeeze off)."""
    kind = _string(s, "type")
    input_dim = int(_scalar(s, "inputDimension"))
    if kind in ("cmpnd", "tensor"):
        comp = _field(s, "comp")
        children, child_params = [], []
        for i in range(comp.shape[-1]):
            c, cp = kern_from_struct(comp[0, i] if comp.ndim == 2 else comp[i])
            children.append(c)
            child_params.append(cp)
        kern = KM.make_kern(kind, input_dim, components=tuple(children))
        return kern, (np.concatenate(child_params) if child_params
                      else np.zeros(0))
    if kind == "whitefixed":
        return (KM.WhiteFixed(input_dim=input_dim,
                              fixed_variance=_scalar(s, "variance")),
                np.zeros(0))
    kwargs = {}
    if kind in ("poly", "polyard"):
        kwargs["degree"] = _scalar(s, "degree")
    kern = KM.make_kern(kind, input_dim, **kwargs)
    names = kern.param_names()
    n_named = len([n for n in names if not n.startswith("inputScale")])
    vals = [_scalar(s, n) for n in names[:n_named]]
    if n_named < len(names):
        vals.extend(np.asarray(_field(s, "inputScales")).ravel().tolist())
    return kern, np.asarray(vals, dtype=np.float64)


def noise_to_struct(noise_type: str, params, output_dim: int, n_data: int,
                    extra=None) -> dict:
    params = np.asarray(params, dtype=np.float64)
    from gpc_tpu import noise as NZ
    nz = NZ.make_noise(noise_type, output_dim, **(extra or {}))
    s = {
        "type": noise_type,
        "numProcess": float(output_dim),
        "numData": float(n_data),
        "nParams": float(nz.n_params),
        "spherical": float(nz.spherical),
        "logconcave": float(nz.log_concave),
        "missing": float(nz.missing),
        "params": params.reshape(1, -1),
    }
    if noise_type in ("gaussian", "probit", "ncnm", "ordered", "scale"):
        s["bias"] = params[:output_dim].reshape(1, -1)
    if noise_type == "gaussian":
        s["sigma2"] = float(params[-1])
    elif noise_type == "probit":
        # probit params are bias-only; sigma2 is the FIXED member the
        # reference serializes separately (CNoise.cpp:181-189) — params[-1]
        # here would be the last bias, not a variance
        s["sigma2"] = float(nz.sigma2_fixed)
    if noise_type == "ncnm":
        s["gammaSplit"] = float((extra or {}).get("split_gamma", 0))
    if noise_type == "ordered":
        s["numCategories"] = float((extra or {}).get("num_categories", 2))
    return s


def noise_from_struct(s):
    """Returns (noise_type, params, extra).

    Reference/_NDLMATLAB noise structs carry NAMED parameter fields (bias,
    sigma2, ... — CNoise.cpp addParamToMxArray) rather than the flat
    `params` vector our writer also emits; reconstruct from the named
    fields when `params` is absent so GPmat-written files load."""
    ntype = _string(s, "type")
    try:
        params = np.asarray(_field(s, "params")).ravel().astype(np.float64)
    except KeyError:
        bias = np.asarray(_field(s, "bias")).ravel().astype(np.float64)
        if ntype == "gaussian":
            params = np.concatenate([bias, [float(_scalar(s, "sigma2"))]])
        elif ntype == "probit":
            params = bias
        else:
            raise ValueError(
                f"noise struct for {ntype!r} has no params vector and no "
                f"known named-field reconstruction")
    extra = {}
    if ntype == "ncnm":
        extra["split_gamma"] = bool(int(_scalar(s, "gammaSplit", 0.0)))
    if ntype == "ordered":
        extra["num_categories"] = int(_scalar(s, "numCategories", 2.0))
    return ntype, params, extra


def write_gp_mat(path, model, X=None, y=None):
    """Save a GP model as GPmat-layout variables gpInfo/kern/noise/params
    (the testGp.cpp fixture convention; CGp::toMxArray field set)."""
    import scipy.io as sio

    spec = model.spec
    gp_info = {
        "type": "gp",
        "approx": spec.approx,
        "learnScales": float(spec.learn_scales),
        "d": float(spec.output_dim),
        "q": float(spec.input_dim),
        "N": float(spec.n_data),
        "k": float(spec.num_active),
        "fixInducing": float(spec.inducing_fixed),
        "pitcBlock": float(spec.pitc_block),
        "scale": np.asarray(model.scales(), dtype=np.float64).reshape(1, -1),
        "bias": np.asarray(model.bias, dtype=np.float64).reshape(1, -1),
    }
    if spec.sparse:
        gp_info["X_u"] = np.asarray(model.inducing(), dtype=np.float64)
        gp_info["beta"] = np.asarray([[float(model.beta())]])
        gp_info["betaTransform"] = "exp"
    noise_params = getattr(model, "noise_params", None)
    if noise_params is None:
        noise_params = np.concatenate(
            [np.zeros(spec.output_dim), [1e-6]])
    data = {
        "gpInfo": gp_info,
        "kern": kern_to_struct(spec.kern, model.kern_params()),
        "noise": noise_to_struct(getattr(model, "noise_type", "gaussian"),
                                 noise_params, spec.output_dim, spec.n_data,
                                 getattr(model, "noise_extra", None)),
        "params": np.asarray(model.theta, dtype=np.float64).reshape(1, -1),
    }
    if X is not None:
        data["X"] = np.asarray(X, dtype=np.float64)
    if y is not None:
        data["y"] = np.asarray(y, dtype=np.float64)
    sio.savemat(path, data)


def read_gp_mat(path, X=None, y=None):
    """Load a GP model saved by write_gp_mat (or MATLAB GPmat equivalents)."""
    import scipy.io as sio
    import jax.numpy as jnp
    from gpc_tpu.models.gp import GP, make_objective

    d = sio.loadmat(path, squeeze_me=False)
    gi = d["gpInfo"]
    kern, kern_params = kern_from_struct(d["kern"])
    ntype, nparams, nextra = noise_from_struct(d["noise"])
    approx = _string(gi, "approx")
    N = int(_scalar(gi, "N"))
    q = int(_scalar(gi, "q"))
    D = int(_scalar(gi, "d"))
    num_active = int(_scalar(gi, "k"))
    learn_scales = bool(int(_scalar(gi, "learnScales")))
    inducing_fixed = bool(int(_scalar(gi, "fixInducing", 0.0)))
    pitc_block = int(_scalar(gi, "pitcBlock", 0.0))
    Xd = X if X is not None else d.get("X")
    yd = y if y is not None else d.get("y")
    if Xd is None or yd is None:
        # unlike the text-model CLI path (which always re-attaches data,
        # gp.cpp:620-622), a .mat model may arrive data-free; refusing beats
        # silently building the objective on zeros
        raise ValueError(
            "read_gp_mat: the .mat file carries no X/y — pass X= and y=")
    model = GP(kern, np.asarray(Xd), np.asarray(yd), approx=approx,
               num_active=num_active, learn_scales=learn_scales,
               centre=False, inducing_fixed=inducing_fixed,
               pitc_block=pitc_block)
    model.bias = np.asarray(_field(gi, "bias")).ravel().astype(np.float64)
    model.fixed_scales = np.asarray(
        _field(gi, "scale")).ravel().astype(np.float64)
    model.noise_type = ntype
    model.noise_params = nparams
    model.noise_extra = nextra
    model.theta = jnp.asarray(d["params"].ravel().astype(np.float64))
    if inducing_fixed:
        model.X_u_fixed = np.asarray(_field(gi, "X_u"))
    model._objective = make_objective(model.spec, np.asarray(Xd),
                                      np.asarray(yd), model.bias,
                                      model.fixed_scales,
                                      X_u_fixed=model.X_u_fixed)
    return model
