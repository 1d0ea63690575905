"""Batched Jubjub (twisted Edwards, a = -1) over Fr limb arrays.

Extended coordinates (X:Y:Z:T), unified add/double formulas (complete for
a=-1, d non-square — "Twisted Edwards Curves Revisited" §3.1), so scalar-mul
chains run inversion-free; affine values are recovered with ONE batched
Montgomery inversion at the end (the TPU-scaled version of the reference's
batch_normalization, core/pairing/src/bls12_381/ec.rs:246).

Replaces the reference's per-scalar double-and-add (core/jubjub/src/curve/
edwards.rs:520-574) with bit-sliced batched chains.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import limbs as L
from ..mirror import jubjub as mjj
from ..mirror.field import R

FR = L.FR

# Montgomery-domain curve constants
_D_MONT = mjj.EDWARDS_D * FR.r_mod_p % R
_D2_MONT = 2 * mjj.EDWARDS_D * FR.r_mod_p % R


def _const(v: int, like=None):
    arr = jnp.asarray(L._int_to_limbs(v, FR.n), dtype=jnp.int32)
    if like is not None:
        arr = arr.reshape((FR.n,) + (1,) * (like.ndim - 1))
    return arr


# ---------------------------------------------------------------------
# host <-> device
# ---------------------------------------------------------------------

def to_extended(points, batch_shape=None):
    """Affine int pairs [(x, y), ...] -> extended limb arrays (Montgomery).

    Returns (X, Y, Z, T) with Z = 1."""
    xs = [p[0] * FR.r_mod_p % R for p in points]
    ys = [p[1] * FR.r_mod_p % R for p in points]
    ts = [x * y % R * pow(FR.r_mod_p, -1, R) % R for x, y in zip(xs, ys)]
    one = FR.r_mod_p
    X = FR.array(xs)
    Y = FR.array(ys)
    Z = FR.array([one] * len(points))
    T = FR.array(ts)
    if batch_shape is not None:
        X, Y, Z, T = (a.reshape((FR.n, *batch_shape)) for a in (X, Y, Z, T))
    return (X, Y, Z, T)


def to_affine_host(pt):
    """Extended limb point(s) -> list of affine int pairs (via host)."""
    X, Y, Z, T = pt
    x, y = normalize(pt)
    xs = L.from_limbs(FR, x, mont=True)
    ys = L.from_limbs(FR, y, mont=True)
    return list(zip(xs, ys))


def identity(batch=()):
    """(0 : 1 : 1 : 0)"""
    zero = L.zeros(FR, batch)
    one = L.ones_mont(FR, batch)
    return (zero, one, one.copy(), zero.copy())


# ---------------------------------------------------------------------
# group law (unified, batched)
# ---------------------------------------------------------------------

@jax.jit
def add(p, q):
    """Unified extended addition, 9M (complete for a=-1)."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    mul = partial(L.mont_mul, FR)
    sub = partial(L.sub, FR)
    addf = partial(L.add, FR)

    a = mul(sub(Y1, X1), sub(Y2, X2))
    b = mul(addf(Y1, X1), addf(Y2, X2))
    c = mul(mul(T1, _const(_D2_MONT, T1)), T2)
    d = addf(mul(Z1, Z2), mul(Z1, Z2))
    e = sub(b, a)
    f = sub(d, c)
    g = addf(d, c)
    h = addf(b, a)
    return (mul(e, f), mul(g, h), mul(f, g), mul(e, h))


@jax.jit
def double(p):
    """Unified extended doubling, 4M + 4S."""
    X1, Y1, Z1, _ = p
    mul = partial(L.mont_mul, FR)
    sub = partial(L.sub, FR)
    addf = partial(L.add, FR)

    a = mul(X1, X1)
    b = mul(Y1, Y1)
    zz = mul(Z1, Z1)
    c = addf(zz, zz)
    xy = addf(X1, Y1)
    e = sub(sub(mul(xy, xy), a), b)
    g = sub(b, a)  # a*A + B with a = -1
    f = sub(g, c)
    h = L.neg(FR, addf(a, b))
    return (mul(e, f), mul(g, h), mul(f, g), mul(e, h))


def select(cond, p, q):
    """cond (bool array over batch) ? p : q, componentwise."""
    return tuple(L.select(cond, a, b) for a, b in zip(p, q))


def neg(p):
    X, Y, Z, T = p
    return (L.neg(FR, X), Y, Z, L.neg(FR, T))


@jax.jit
def normalize(pt):
    """Extended -> affine (x, y) Montgomery limb arrays (batched inverse)."""
    X, Y, Z, T = pt
    flat = Z.reshape(FR.n, -1)
    zinv = L.batch_inv_mont(FR, flat, axis=1).reshape(Z.shape)
    return (L.mont_mul(FR, X, zinv), L.mont_mul(FR, Y, zinv))


def normalize_many(points):
    """Batch-normalize a list of extended points with ONE inversion."""
    Zs = jnp.stack([p[2].reshape(FR.n, -1) for p in points], axis=1)
    shape = Zs.shape
    zinv = L.batch_inv_mont(FR, Zs.reshape(FR.n, -1), axis=1).reshape(shape)
    out = []
    for i, (X, Y, Z, T) in enumerate(points):
        zi = zinv[:, i].reshape(Z.shape)
        out.append((L.mont_mul(FR, X, zi), L.mont_mul(FR, Y, zi)))
    return out


# ---------------------------------------------------------------------
# scalar multiplication
# ---------------------------------------------------------------------

@jax.jit
def scalar_mul_bits(base, bits):
    """Double-and-add: base is an extended point batch, bits is an
    (n_bits, *batch) int32 array of LE bits.  Matches edwards.rs mul
    semantics (LSB-first accumulate, base doubles each step)."""
    n_bits = bits.shape[0]

    def step(carry, bit):
        acc, cur = carry
        cand = add(acc, cur)
        acc = select(bit.astype(bool), cand, acc)
        cur = double(cur)
        return (acc, cur), None

    init = (identity(base[0].shape[1:]), base)
    (acc, _), _ = jax.lax.scan(step, init, bits)
    return acc


def is_identity(pt):
    """Check X == 0 and Y == Z (projective identity test)."""
    X, Y, Z, _ = pt
    return jnp.logical_and(L.is_zero(X), L.eq(Y, Z))
