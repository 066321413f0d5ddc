"""Fused Gram-matrix tiles in Pallas: distance map + elementwise kernel in VMEM.

The reference assembles kernel matrices with O(N²) scalar virtual calls
(CKern.h:120-144, the hot loop flagged at CGp.cpp:693-735).  Here a whole
N×N Gram matrix streams through the MXU in TILE×TILE blocks: each grid step
computes its cross-product block (one MXU matmul), forms squared distances from
precomputed row norms, applies the covariance map on the VPU, and writes the
finished tile — K never round-trips to HBM in intermediate form, so the fusion
saves two full N×N HBM writes+reads vs an unfused dist2→exp pipeline.

Families (one tile kernel each, serving all its kernels):
  distance-based — rbf, exp/OU, ratquad, matern32, matern52 (+ ARD via
  pre-scaled inputs X·√s);
  inner-product — lin, poly, mlp (the arcsin map needs per-row norms too).

Falls back to plain jnp (same math, XLA-fused) off-TPU or for ragged shapes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu import linalg

try:  # pallas is TPU/interpret-only in this image
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_TILE = 256

# distance-family covariance maps: (d2, p0, p1, p2) -> tile
_DIST_MAPS = {
    "rbf": lambda d2, p0, p1, p2: p1 * jnp.exp(-0.5 * p0 * d2),
    "exp": lambda d2, p0, p1, p2: p1 * jnp.exp(-p0 * jnp.sqrt(d2 + 1e-30)),
    "ratquad": lambda d2, p0, p1, p2: p2 * jnp.power(
        1.0 + d2 * (0.5 / (p1 * p1 * p0)), -p0),
    "matern32": lambda d2, p0, p1, p2: _m32(d2, p0, p1),
    "matern52": lambda d2, p0, p1, p2: _m52(d2, p0, p1),
}


def _m32(d2, ell, var):
    u = jnp.sqrt(d2 * (3.0 / (ell * ell)) + 1e-30)
    return var * (1.0 + u) * jnp.exp(-u)


def _m52(d2, ell, var):
    n2 = d2 * (5.0 / (ell * ell))
    u = jnp.sqrt(n2 + 1e-30)
    return var * (1.0 + u + n2 / 3.0) * jnp.exp(-u)


def _dist_tile_kernel(family, x1_ref, x2_ref, n1_ref, n2_ref, p_ref, out_ref):
    x1 = x1_ref[:]
    x2 = x2_ref[:]
    cross = jax.lax.dot_general(x1, x2, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    d2 = jnp.maximum(n1_ref[:] + n2_ref[:].T - 2.0 * cross, 0.0)
    p0, p1, p2 = p_ref[0, 0], p_ref[0, 1], p_ref[0, 2]
    out_ref[:] = _DIST_MAPS[family](d2, p0, p1, p2)


@functools.partial(jax.jit, static_argnames=("family", "tile", "interpret"))
def dist_gram(family: str, params, X1, X2, tile: int = _TILE,
              interpret: bool = False):
    """Cross-covariance for a distance-family kernel via fused Pallas tiles.

    params: length-3 vector (family-specific layout matching gpc_tpu.kernels:
    rbf/exp → [inverseWidth, variance, ·]; ratquad → [alpha, lengthScale,
    variance]; matern → [lengthScale, variance, ·])."""
    n, m = X1.shape[0], X2.shape[0]
    if (not _HAVE_PALLAS) or n % tile or m % tile:
        return _dist_fallback(family, params, X1, X2)
    X1 = X1.astype(jnp.float32)
    X2 = X2.astype(jnp.float32)
    n1 = jnp.sum(X1 * X1, axis=1, keepdims=True)
    n2 = jnp.sum(X2 * X2, axis=1, keepdims=True)
    p = jnp.zeros((1, 3), jnp.float32).at[0, :params.shape[0]].set(
        params.astype(jnp.float32))
    q = X1.shape[1]
    grid = (n // tile, m // tile)
    return pl.pallas_call(
        functools.partial(_dist_tile_kernel, family),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, q), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, q), lambda i, j: (j, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(X1, X2, n1, n2, p)


def _dist_fallback(family, params, X1, X2):
    d2 = linalg.dist2(X1, X2)
    p = jnp.zeros((3,), params.dtype).at[:params.shape[0]].set(params)
    return _DIST_MAPS[family](d2, p[0], p[1], p[2])


def _inner_tile_kernel(family, degree, x1_ref, x2_ref, n1_ref, n2_ref, p_ref,
                       out_ref):
    x1 = x1_ref[:]
    x2 = x2_ref[:]
    cross = jax.lax.dot_general(x1, x2, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    p0, p1, p2 = p_ref[0, 0], p_ref[0, 1], p_ref[0, 2]
    if family == "lin":
        out_ref[:] = p0 * cross
    elif family == "poly":
        out_ref[:] = p2 * jnp.power(p0 * cross + p1, degree)
    else:  # mlp arcsin
        numer = p0 * cross + p1
        d1 = p0 * n1_ref[:] + p1 + 1.0
        d2_ = p0 * n2_ref[:].T + p1 + 1.0
        arg = numer * jax.lax.rsqrt(d1 * d2_)
        out_ref[:] = p2 * jnp.arcsin(jnp.clip(arg, -1.0, 1.0))


@functools.partial(jax.jit, static_argnames=("family", "degree", "tile", "interpret"))
def inner_gram(family: str, params, X1, X2, degree: float = 2.0,
               tile: int = _TILE, interpret: bool = False):
    """Cross-covariance for inner-product-family kernels (lin/poly/mlp)."""
    n, m = X1.shape[0], X2.shape[0]
    if (not _HAVE_PALLAS) or n % tile or m % tile:
        return _inner_fallback(family, params, X1, X2, degree)
    X1 = X1.astype(jnp.float32)
    X2 = X2.astype(jnp.float32)
    n1 = jnp.sum(X1 * X1, axis=1, keepdims=True)
    n2 = jnp.sum(X2 * X2, axis=1, keepdims=True)
    p = jnp.zeros((1, 3), jnp.float32).at[0, :params.shape[0]].set(
        params.astype(jnp.float32))
    q = X1.shape[1]
    grid = (n // tile, m // tile)
    return pl.pallas_call(
        functools.partial(_inner_tile_kernel, family, degree),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, q), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, q), lambda i, j: (j, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(X1, X2, n1, n2, p)


def _inner_fallback(family, params, X1, X2, degree):
    cross = X1 @ X2.T
    if family == "lin":
        return params[0] * cross
    if family == "poly":
        return params[2] * jnp.power(params[0] * cross + params[1], degree)
    numer = params[0] * cross + params[1]
    d1 = params[0] * jnp.sum(X1 * X1, 1) + params[1] + 1.0
    d2_ = params[0] * jnp.sum(X2 * X2, 1) + params[1] + 1.0
    arg = numer / jnp.sqrt(d1[:, None] * d2_[None, :])
    return params[2] * jnp.arcsin(jnp.clip(arg, -1.0, 1.0))
