"""Field adapters: a uniform op interface over Fq limb arrays and Fq2 pairs.

Lets the Weierstrass group law (ec/weierstrass.py) be written once and
instantiated for G1 (base field Fq) and G2 (extension Fq2), mirroring the
reference's `curve_impl!` macro genericity (core/pairing/src/bls12_381/ec.rs:1)
in array-programming form.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ..ff import limbs as L
from ..mirror.field import Q

FQ = L.FQ


class FqOps:
    """Elements: (32, *batch) int32 limb arrays, Montgomery domain."""

    name = "fq"

    @staticmethod
    def add(a, b):
        return L.add(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return L.sub(FQ, a, b)

    @staticmethod
    def neg(a):
        return L.neg(FQ, a)

    @staticmethod
    def mul(a, b):
        return L.mont_mul(FQ, a, b)

    @staticmethod
    def sqr(a):
        return L.mont_sqr(FQ, a)

    @staticmethod
    def is_zero(a):
        return L.is_zero(a)

    @staticmethod
    def select(cond, a, b):
        return L.select(cond, a, b)

    @staticmethod
    def zeros(batch=()):
        return L.zeros(FQ, batch)

    @staticmethod
    def ones(batch=()):
        return L.ones_mont(FQ, batch)

    @staticmethod
    def batch_inv_flat(a):
        """Inverse along a flattened batch axis (axis=1 of (n, B))."""
        return L.batch_inv_mont(FQ, a, axis=1)

    @staticmethod
    def from_ints(vals, batch_shape=None):
        arr = L.to_limbs(FQ, [v % Q for v in vals], mont=True)
        if batch_shape is not None:
            arr = arr.reshape((FQ.n, *batch_shape))
        return arr

    @staticmethod
    def to_ints(arr):
        return L.from_limbs(FQ, arr, mont=True)

    @staticmethod
    def stack(elems, axis):
        return jnp.stack(elems, axis=axis)

    @staticmethod
    def index(arr, idx, axis):
        return jnp.take(arr, idx, axis=axis)

    @staticmethod
    def batch_shape(a):
        return a.shape[1:]


class Fq2Ops:
    """Elements: (c0, c1) tuples of Fq limb arrays; u^2 = -1."""

    name = "fq2"

    @staticmethod
    def add(a, b):
        return (FqOps.add(a[0], b[0]), FqOps.add(a[1], b[1]))

    @staticmethod
    def sub(a, b):
        return (FqOps.sub(a[0], b[0]), FqOps.sub(a[1], b[1]))

    @staticmethod
    def neg(a):
        return (FqOps.neg(a[0]), FqOps.neg(a[1]))

    @staticmethod
    def mul(a, b):
        # Karatsuba (fq2.rs mul_assign)
        aa = FqOps.mul(a[0], b[0])
        bb = FqOps.mul(a[1], b[1])
        o = FqOps.mul(FqOps.add(a[0], a[1]), FqOps.add(b[0], b[1]))
        return (FqOps.sub(aa, bb), FqOps.sub(o, FqOps.add(aa, bb)))

    @staticmethod
    def sqr(a):
        ab = FqOps.mul(a[0], a[1])
        c0 = FqOps.mul(FqOps.add(a[0], a[1]), FqOps.sub(a[0], a[1]))
        return (c0, FqOps.add(ab, ab))

    @staticmethod
    def is_zero(a):
        return jnp.logical_and(FqOps.is_zero(a[0]), FqOps.is_zero(a[1]))

    @staticmethod
    def select(cond, a, b):
        return (FqOps.select(cond, a[0], b[0]), FqOps.select(cond, a[1], b[1]))

    @staticmethod
    def zeros(batch=()):
        return (FqOps.zeros(batch), FqOps.zeros(batch))

    @staticmethod
    def ones(batch=()):
        return (FqOps.ones(batch), FqOps.zeros(batch))

    @staticmethod
    def batch_inv_flat(a):
        # 1/(c0 + c1 u) = (c0 - c1 u) / (c0^2 + c1^2)
        norm = FqOps.add(FqOps.sqr(a[0]), FqOps.sqr(a[1]))
        t = FqOps.batch_inv_flat(norm)
        return (FqOps.mul(a[0], t), FqOps.neg(FqOps.mul(a[1], t)))

    @staticmethod
    def from_ints(vals, batch_shape=None):
        return (
            FqOps.from_ints([v[0] for v in vals], batch_shape),
            FqOps.from_ints([v[1] for v in vals], batch_shape),
        )

    @staticmethod
    def to_ints(arr):
        return list(zip(FqOps.to_ints(arr[0]), FqOps.to_ints(arr[1])))

    @staticmethod
    def stack(elems, axis):
        return (
            jnp.stack([e[0] for e in elems], axis=axis),
            jnp.stack([e[1] for e in elems], axis=axis),
        )

    @staticmethod
    def index(arr, idx, axis):
        return (jnp.take(arr[0], idx, axis=axis), jnp.take(arr[1], idx, axis=axis))

    @staticmethod
    def batch_shape(a):
        return a[0].shape[1:]
