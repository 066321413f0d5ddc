"""Reference-compatible text model files (version=0.2 `field=value` streams).

Counterpart of CNdlInterfaces.h:21-189 + the writeParamsToStream/readParamsFromStream
chain of CGp (CGp.cpp:1606-1682), CKern (CKern.cpp:15-46, 113-137), CNoise
(CNoise.cpp:275-286) and CMatrix (CMatrix.cpp:1057-1122).  Files written by the
reference `gp` binary load here and vice versa: every nested object emits its own
`version=0.200000` line (fixed, 6 decimals) followed by fields; matrices are
`baseType=matrix / type=doubleMatrix / numRows= / numCols=` then rows of
17-digit scientific values; `#` lines are comments (ndlstrutil::getline skips).
"""

from __future__ import annotations

import io as _io
import math

import numpy as np

from gpc_tpu import kernels as KM
from gpc_tpu import priors as priors_mod

VERSION = 0.2
APPROX_CODE = {"ftc": 0, "dtc": 1, "fitc": 2, "pitc": 3, "dtcvar": 4}
APPROX_NAME = {v: k for k, v in APPROX_CODE.items()}


# ---------------------------------------------------------------------------
# low-level stream helpers
# ---------------------------------------------------------------------------

def _parse_float(s: str) -> float:
    """float() plus C99 hexfloat ("0x1.99…p-3"): once the reference has
    streamed a scientific-formatted matrix, its ios flags are fixed|scientific
    — which C++11 renders as HEXFLOAT — so every later version= line in an
    oracle-written file is hex (CNdlInterfaces.h:27-31 sets flags without
    clearing; its own strtod-based reader accepts both, and so must we)."""
    try:
        return float(s)
    except ValueError:
        return float.fromhex(s)


class Reader:
    def __init__(self, text: str):
        # comment lines are skipped wherever they appear (ndlstrutil.h:17-18)
        self.lines = [ln.rstrip("\r") for ln in text.splitlines()
                      if ln.strip() and not ln.lstrip().startswith("#")]
        self.pos = 0

    def line(self) -> str:
        if self.pos >= len(self.lines):
            raise ValueError("Unexpected end of stream")
        ln = self.lines[self.pos]
        self.pos += 1
        return ln

    def field(self, name: str) -> str:
        ln = self.line()
        key, _, val = ln.partition("=")
        if key != name:
            raise ValueError(f"Stream format error: expected field {name}, got {key}")
        return val

    def int_(self, name): return int(_parse_float(self.field(name)))
    def float_(self, name): return _parse_float(self.field(name))
    def bool_(self, name): return self.int_(name) != 0

    def version(self):
        v = self.float_("version")
        if v < VERSION:
            raise ValueError(f"Stream version {v} below minimum {VERSION}")
        return v

    def matrix(self) -> np.ndarray:
        self.version()
        if self.field("baseType") != "matrix":
            raise ValueError("Unexpected base type (wanted matrix)")
        if self.field("type") != "doubleMatrix":
            raise ValueError("Unexpected matrix type")
        rows = self.int_("numRows")
        cols = self.int_("numCols")
        out = np.zeros((rows, cols))
        for i in range(rows):
            toks = self.line().split()
            if len(toks) != cols:
                raise ValueError(f"Incorrect number of columns in row {i}")
            out[i] = [_parse_float(t) for t in toks]
        return out


class Writer:
    def __init__(self):
        self.buf = _io.StringIO()

    def field(self, name, val):
        if isinstance(val, bool):
            val = int(val)
        if isinstance(val, float):
            val = f"{val:.17e}"
        self.buf.write(f"{name}={val}\n")

    def version(self):
        self.buf.write(f"version={VERSION:.6f}\n")

    def matrix(self, M: np.ndarray):
        M = np.atleast_2d(np.asarray(M, dtype=np.float64))
        self.version()
        self.field("baseType", "matrix")
        self.field("type", "doubleMatrix")
        self.field("numRows", M.shape[0])
        self.field("numCols", M.shape[1])
        for i in range(M.shape[0]):
            self.buf.write(" ".join(f"{v:.17e}" for v in M[i]) + "\n")

    def text(self) -> str:
        return self.buf.getvalue()


# ---------------------------------------------------------------------------
# priors (CRegularisable::writePriorsToStream, CDist.h:281-303)
# ---------------------------------------------------------------------------

_PRIOR_NPARAMS = {"gaussian": 1, "gamma": 2, "wang": 1}


def _write_prior(w: Writer, prior):
    w.field("priorIndex", prior.index)
    w.version()
    w.field("baseType", "dist")
    w.field("type", prior.kind)
    w.field("numParams", _PRIOR_NPARAMS[prior.kind])
    w.matrix(np.asarray(prior.hyp).reshape(1, -1))


def _read_prior(r: Reader):
    idx = int(float(r.field("priorIndex")))
    r.version()
    r.field("baseType")
    kind = r.field("type")
    n = r.int_("numParams")
    hyp = r.matrix().reshape(-1)
    if len(hyp) != n:
        raise ValueError("prior numParams mismatch")
    return priors_mod.Prior(kind, tuple(float(h) for h in hyp), idx)


# ---------------------------------------------------------------------------
# kernels (CKern.cpp:15-46; CComponentKern.cpp:113-137; CPolyKern:2668-2684;
# CWhitefixedKern:773-793; factory readKernFromStream CKern.cpp:4192-4259)
# ---------------------------------------------------------------------------

def write_kern(w: Writer, kern: KM.Kern, params: np.ndarray):
    params = np.asarray(params)
    w.version()
    w.field("baseType", "kern")
    w.field("type", kern.kind)
    w.field("inputDim", kern.input_dim)
    w.field("numParams", kern.n_params)
    if kern.kind in ("cmpnd", "tensor"):
        w.field("numKerns", len(kern.components))
        off = kern.offsets()
        for i, c in enumerate(kern.components):
            write_kern(w, c, params[off[i]:off[i + 1]])
        return
    if kern.kind == "whitefixed":
        w.field("variance", float(kern.fixed_variance))
        return
    if kern.kind in ("poly", "polyard"):
        deg = kern.degree
        w.field("degree", int(deg) if deg == int(deg) else deg)
    w.matrix(params.reshape(1, -1))
    w.field("numPriors", len(kern.priors))
    for pr in kern.priors:
        _write_prior(w, pr)


def read_kern(r: Reader):
    """Returns (kern, params)."""
    r.version()
    r.field("baseType")
    kind = r.field("type")
    input_dim = r.int_("inputDim")
    n_params = r.int_("numParams")
    if kind in ("cmpnd", "tensor"):
        num_kerns = r.int_("numKerns")
        children, child_params = [], []
        for _ in range(num_kerns):
            c, cp = read_kern(r)
            children.append(c)
            child_params.append(cp)
        kern = KM.make_kern(kind, input_dim, components=tuple(children))
        params = np.concatenate(child_params) if child_params else np.zeros(0)
        return kern, params
    if kind == "whitefixed":
        var = r.float_("variance")
        return KM.WhiteFixed(input_dim=input_dim, fixed_variance=var), np.zeros(0)
    kwargs = {}
    if kind in ("poly", "polyard"):
        kwargs["degree"] = r.float_("degree")
    params = r.matrix().reshape(-1)
    if len(params) != n_params:
        raise ValueError("Listed number of parameters does not match computed number of parameters.")
    num_priors = r.int_("numPriors")
    priors = tuple(_read_prior(r) for _ in range(num_priors))
    kern = KM.make_kern(kind, input_dim, **kwargs).with_priors(priors)
    return kern, params


# ---------------------------------------------------------------------------
# noise models (CNoise.cpp:275-286; factory CNoise.cpp:1813-1832)
# ---------------------------------------------------------------------------

def write_noise(w: Writer, noise_type: str, params: np.ndarray, output_dim: int,
                n_data: int = 1, extra=None):
    """Base format CNoise.cpp:275-286; ncnm adds numData+gammaSplit
    (CNoise.cpp:1376-1387), ordered adds numData+numCategories
    (CNoise.cpp:1770-1781)."""
    extra = extra or {}
    w.version()
    w.field("baseType", "noise")
    w.field("type", noise_type)
    if noise_type in ("ncnm", "ordered"):
        w.field("numData", n_data)
    w.field("outputDim", output_dim)
    w.field("numParams", len(np.atleast_1d(params)))
    if noise_type == "ncnm":
        w.field("gammaSplit", int(extra.get("gammaSplit", 0)))
    if noise_type == "ordered":
        w.field("numCategories", int(extra.get("numCategories", 3)))
    w.matrix(np.asarray(params).reshape(1, -1))


def read_noise(r: Reader):
    """Returns (noise_type, params, output_dim, extra)."""
    r.version()
    r.field("baseType")
    ntype = r.field("type")
    extra = {}
    if ntype in ("ncnm", "ordered"):
        extra["numData"] = r.int_("numData")
    output_dim = r.int_("outputDim")
    n = r.int_("numParams")
    if ntype == "ncnm":
        extra["gammaSplit"] = r.int_("gammaSplit")
    if ntype == "ordered":
        extra["numCategories"] = r.int_("numCategories")
    params = r.matrix().reshape(-1)
    if len(params) != n:
        raise ValueError("noise numParams mismatch")
    return ntype, params, output_dim, extra


def make_noise_from_stream(ntype, params, output_dim, extra):
    """Instantiate a gpc_tpu.noise model from stream fields."""
    from gpc_tpu import noise as NZ
    kwargs = {}
    if ntype == "ncnm":
        kwargs["split_gamma"] = bool(extra.get("gammaSplit", 0))
    if ntype == "ordered":
        kwargs["num_categories"] = int(extra.get("numCategories", 3))
    return NZ.make_noise(ntype, output_dim, **kwargs)


# ---------------------------------------------------------------------------
# GP model files (CGp.cpp:1655-1682 write, 1606-1653 read)
# ---------------------------------------------------------------------------

def write_gp(path, model, comment: str = ""):
    """model: gpc_tpu.models.gp.GP"""
    spec = model.spec
    w = Writer()
    if comment:
        w.buf.write(f"# {comment}\n")
    w.version()
    w.field("baseType", "dataModel")
    w.field("type", "gp")
    w.field("numData", spec.n_data)
    w.field("outputDim", spec.output_dim)
    w.field("inputDim", spec.input_dim)
    w.field("sparseApproximation", APPROX_CODE[spec.approx])
    w.field("numActive", spec.num_active)
    if spec.sparse:
        beta_mat = np.full((spec.n_data, spec.output_dim), model.beta())
        w.matrix(beta_mat)
    w.field("learnScale", spec.learn_scales)
    w.field("learnBias", False)
    w.matrix(np.asarray(model.scales()).reshape(1, -1))
    w.matrix(np.asarray(model.bias).reshape(1, -1))
    write_kern(w, spec.kern, model.kern_params())
    noise_type = getattr(model, "noise_type", "gaussian")
    noise_params = getattr(model, "noise_params", None)
    if noise_params is None:
        noise_params = np.concatenate([np.zeros(spec.output_dim), [1e-6]])
    # ncnm/ordered blocks carry numData (the reference reader sizes per-data
    # site storage from it, CNoise.cpp:1376-1387) and their extra fields —
    # round-trip what read_gp preserved, never the write_noise defaults
    write_noise(w, noise_type, noise_params, spec.output_dim,
                n_data=spec.n_data,
                extra=getattr(model, "noise_extra", None))
    if spec.sparse:
        w.field("fixInducing", spec.inducing_fixed)
        w.matrix(np.asarray(model.inducing()))
    with open(path, "w") as f:
        f.write(w.text())


def write_ivm(path, model, comment: str = ""):
    """model: gpc_tpu.models.ivm.IVM (CIvm::writeParamsToStream, CIvm.cpp:773-790)."""
    spec = model.spec
    st = model.state
    w = Writer()
    if comment:
        w.buf.write(f"# {comment}\n")
    w.version()
    # CIvm extends CMapModel, whose ctor sets baseType "mapModel"
    # (CDataModel.h:118) — unlike CGp/CGplvm's "dataModel"; the reference
    # reader hard-errors on a mismatch (CIvm.cpp:793-795)
    w.field("baseType", "mapModel")
    w.field("type", "ivm")
    w.field("numData", spec.n_data)
    w.field("outputDim", spec.output_dim)
    w.field("inputDim", spec.input_dim)
    w.field("numActive", spec.num_active)
    write_kern(w, spec.kern, np.asarray(model.kern_params))
    extra = {}
    if spec.noise.kind == "ncnm":
        extra["gammaSplit"] = int(spec.noise.split_gamma)
    if spec.noise.kind == "ordered":
        extra["numCategories"] = spec.noise.num_categories
    write_noise(w, spec.noise.kind, np.asarray(model.noise_params),
                spec.output_dim, n_data=spec.n_data, extra=extra)
    order = np.asarray(st.active_idx)
    w.field("activeSet", " ".join(str(int(i)) for i in order))
    w.matrix(np.asarray(model.y)[order])
    w.matrix(np.asarray(model.X)[order])
    w.matrix(np.asarray(st.m_site))
    w.matrix(np.asarray(st.beta_site))
    with open(path, "w") as f:
        f.write(w.text())


def read_ivm(path, X=None, y=None):
    """Load an ivm model file (CIvm::readParamsFromStream, CIvm.cpp:791-860).

    Returns an IVM with kernel/noise params and a restored active set/site
    state (L rebuilt from K+B⁻¹ like the reference)."""
    import jax.numpy as jnp
    from gpc_tpu.models.ivm import IVM, IvmState

    with open(path) as f:
        r = Reader(f.read())
    r.version()
    # accept "dataModel" too: files written by gpc_tpu rounds ≤3 used it
    # (the reference's own CIvm writes "mapModel", CDataModel.h:118)
    if r.field("baseType") not in ("mapModel", "dataModel") or \
            r.field("type") != "ivm":
        raise ValueError("not an ivm model file")
    n_data = r.int_("numData")
    output_dim = r.int_("outputDim")
    input_dim = r.int_("inputDim")
    num_active = r.int_("numActive")
    kern, kern_params = read_kern(r)
    ntype, nparams, nod, nextra = read_noise(r)
    noise = make_noise_from_stream(ntype, nparams, nod, nextra)
    active = np.array([int(t) for t in r.field("activeSet").split()], dtype=np.int32)
    activeY = r.matrix()
    activeX = r.matrix()
    m_site = r.matrix()
    beta_site = r.matrix()

    if X is not None and np.asarray(X).shape[1] != input_dim:
        raise DataDimensionError(
            f"model expects inputDim={input_dim}, data has {np.asarray(X).shape[1]}")
    if X is None:
        X = np.zeros((n_data, input_dim))
        X[active] = activeX
    if y is None:
        y = np.zeros((n_data, output_dim))
        y[active] = activeY
    model = IVM(kern, noise, X, y, num_active=num_active,
                kern_params=kern_params, noise_params=nparams)
    mask = np.zeros(n_data, bool)
    mask[active] = True
    model.state = IvmState(
        active_idx=jnp.asarray(active),
        active_mask=jnp.asarray(mask),
        m_site=jnp.asarray(m_site),
        beta_site=jnp.asarray(beta_site),
        mu=jnp.zeros((n_data, output_dim)),
        varsigma=jnp.zeros((n_data, output_dim)),
        nu=jnp.zeros((n_data, output_dim)),
        g=jnp.zeros((n_data, output_dim)))
    return model


def write_gplvm(path, model, labels=None, comment: str = ""):
    """model: gpc_tpu.models.gplvm.GPLVM (CGplvm::writeParamsToStream,
    CGplvm.cpp: format header + kern + [dynKern] + noise + Y/X data block)."""
    spec = model.spec
    w = Writer()
    if comment:
        w.buf.write(f"# {comment}\n")
    w.version()
    w.field("baseType", "dataModel")
    w.field("type", "gplvm")
    w.field("numData", spec.n_data)
    w.field("outputDim", spec.data_dim)
    w.field("inputDim", spec.latent_dim)
    w.field("latentRegularised", spec.latent_regularised)
    w.field("backConstrained", spec.back_constrained)
    w.field("dynamicsLearnt", spec.has_dynamics)
    write_kern(w, spec.kern, model.kern_params())
    if spec.has_dynamics:
        write_kern(w, spec.dyn_kern, model.dyn_kern_params())
    # scale noise: params [bias×D, scale×D] (CScaleNoise::getParams)
    noise_params = np.concatenate([model.noise_bias, model.scales()])
    write_noise(w, "scale", noise_params, spec.data_dim)
    header = f"Y:{spec.data_dim},X:{spec.latent_dim}"
    if labels is not None:
        header += ",labels:1"
    w.buf.write(header + "\n")
    X = model.latent_X()
    y = np.asarray(model.y)
    for i in range(spec.n_data):
        row = " ".join(f"{v:.17e}" for v in y[i]) + " " + \
              " ".join(f"{v:.17e}" for v in X[i])
        if labels is not None:
            row += f" {int(labels[i])}"
        w.buf.write(row + " \n" if labels is None else row + "\n")
    with open(path, "w") as f:
        f.write(w.text())


def read_gplvm(path):
    """Load a gplvm model file.  Returns (model, labels or None)."""
    from gpc_tpu.models.gplvm import GPLVM

    with open(path) as f:
        r = Reader(f.read())
    r.version()
    if r.field("baseType") != "dataModel" or r.field("type") != "gplvm":
        raise ValueError("not a gplvm model file")
    n_data = r.int_("numData")
    data_dim = r.int_("outputDim")
    latent_dim = r.int_("inputDim")
    latent_reg = r.bool_("latentRegularised")
    back = r.bool_("backConstrained")
    dyn = r.bool_("dynamicsLearnt")
    kern, kern_params = read_kern(r)
    dyn_kern, dyn_params = (None, None)
    if dyn:
        dyn_kern, dyn_params = read_kern(r)
    ntype, nparams, _, _ = read_noise(r)
    header = r.line()
    has_labels = "labels:1" in header
    Y = np.zeros((n_data, data_dim))
    X = np.zeros((n_data, latent_dim))
    labels = [] if has_labels else None
    for i in range(n_data):
        toks = r.line().split()
        Y[i] = [float(t) for t in toks[:data_dim]]
        X[i] = [float(t) for t in toks[data_dim:data_dim + latent_dim]]
        if has_labels:
            labels.append(int(float(toks[data_dim + latent_dim])))

    bias = nparams[:data_dim]
    scales = nparams[data_dim:]
    # init='rand' skips the O(N·D²) PCA eigendecomposition — theta (with the
    # stored latents) is assigned wholesale right below
    model = GPLVM(kern, Y, latent_dim=latent_dim, dyn_kern=dyn_kern,
                  dyn_kern_params=dyn_params, centre=False,
                  latent_regularised=latent_reg, init="rand")
    model.noise_bias = bias
    model.fixed_scales = scales
    import jax.numpy as jnp
    model.theta = jnp.asarray(model.spec.pack(
        kern_params, X,
        dyn_params=dyn_params if (dyn and model.spec.dyn_kern_learnt) else None,
        scales=None))
    model._objective = model._make_objective()
    if back:
        # back-constraint kernel info is not serialized by the reference either
        # (CGplvm.cpp: 'In future back constraint info goes here')
        pass
    return model, (np.asarray(labels) if has_labels else None)


class DataDimensionError(ValueError):
    """Re-attached data doesn't match the stored model's inputDim.

    The readers rebuild the model spec FROM the attached X, so this check
    must happen against the FILE's inputDim before construction — a caller
    comparing the returned model's spec against X.shape[1] compares X with
    itself (the reference errors at the CLI layer, gp.cpp:502-503)."""


def read_gp(path, X=None, y=None):
    """Load a gp model file; re-attach data if given (readGpFromFile re-attaches
    py/pX at the CLI layer, gp.cpp:620-622).  Returns a GP with restored state."""
    from gpc_tpu.models.gp import GP

    with open(path) as f:
        r = Reader(f.read())
    r.version()
    if r.field("baseType") != "dataModel" or r.field("type") != "gp":
        raise ValueError("not a gp model file")
    n_data = r.int_("numData")
    output_dim = r.int_("outputDim")
    input_dim = r.int_("inputDim")
    approx = APPROX_NAME[r.int_("sparseApproximation")]
    num_active = r.int_("numActive")
    beta = None
    if approx != "ftc":
        beta = float(r.matrix()[0, 0])
    learn_scale = r.bool_("learnScale")
    r.bool_("learnBias")
    scales = r.matrix().reshape(-1)
    bias = r.matrix().reshape(-1)
    kern, kern_params = read_kern(r)
    noise_type, noise_params, _, noise_extra = read_noise(r)
    X_u = None
    inducing_fixed = False
    if approx != "ftc":
        inducing_fixed = r.bool_("fixInducing")
        X_u = r.matrix()

    if X is not None and np.asarray(X).shape[1] != input_dim:
        raise DataDimensionError(
            f"model expects inputDim={input_dim}, data has {np.asarray(X).shape[1]}")
    if X is None:
        X = np.zeros((n_data, input_dim))
    if y is None:
        y = np.zeros((n_data, output_dim))
    model = GP(kern, X, y, approx=approx, num_active=num_active,
               learn_scales=learn_scale, centre=False,
               inducing_fixed=inducing_fixed)
    model.bias = bias
    model.fixed_scales = scales
    model.noise_type = noise_type
    model.noise_params = noise_params
    model.noise_extra = noise_extra
    if inducing_fixed:
        model.X_u_fixed = X_u
    import jax.numpy as jnp
    model.theta = jnp.asarray(
        model.spec.pack(kern_params,
                        X_u=None if inducing_fixed else X_u,
                        scales=scales if learn_scale else None,
                        beta=beta))
    # rebuild objective with restored bias/scales (and fixed inducing inputs)
    from gpc_tpu.models.gp import make_objective
    model._objective = make_objective(model.spec, X, y, model.bias,
                                      model.fixed_scales,
                                      X_u_fixed=model.X_u_fixed)
    return model
