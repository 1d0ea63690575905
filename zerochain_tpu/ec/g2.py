"""BLS12-381 G2 batched kernels (Fq2 pairs of limb arrays, Jacobian)."""

from __future__ import annotations

from functools import partial

import jax

from . import weierstrass as W
from .fields import Fq2Ops

F = Fq2Ops

_add = jax.jit(partial(W.add, F))
_add_mixed = jax.jit(partial(W.add_mixed, F))
_double = jax.jit(partial(W.double, F))
_normalize = jax.jit(partial(W.normalize, F))
_scalar_mul = jax.jit(partial(W.scalar_mul_bits, F))


def from_affine_host(points, batch_shape=None):
    """[((x0,x1),(y0,y1)) | None, ...] -> ((X0,X1),(Y0,Y1),(Z0,Z1))."""
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append((0, 0))
            ys.append((0, 0))
            zs.append((0, 0))
        else:
            xs.append(p[0])
            ys.append(p[1])
            zs.append((1, 0))
    return (
        F.from_ints(xs, batch_shape),
        F.from_ints(ys, batch_shape),
        F.from_ints(zs, batch_shape),
    )


def to_affine_host(p):
    x, y, inf = W.normalize(F, p)
    xs = F.to_ints(x)
    ys = F.to_ints(y)
    import numpy as np

    infs = np.asarray(inf).reshape(-1)
    return [None if i else (xv, yv) for xv, yv, i in zip(xs, ys, infs)]


def identity(batch=()):
    return W.identity(F, batch)


def add(p, q):
    return _add(p, q)


def add_mixed(p, q_affine, q_inf=None):
    if q_inf is None:
        return _add_mixed(p, q_affine)
    return _add_mixed(p, q_affine, q_inf)


def double(p):
    return _double(p)


def neg(p):
    return W.neg(F, p)


def select(cond, p, q):
    return W.select(F, cond, p, q)


def normalize(p):
    return _normalize(p)


def scalar_mul_bits(base_affine, bits, base_inf=None):
    if base_inf is None:
        return _scalar_mul(base_affine, bits)
    return _scalar_mul(base_affine, bits, base_inf)
