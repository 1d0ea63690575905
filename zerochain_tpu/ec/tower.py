"""Device Fq6/Fq12 tower arithmetic over batched Fq limb arrays.

Elements are nested tuples of (n_limbs, *batch) int32 Montgomery limb
arrays: Fq2 = (c0, c1), Fq6 = (fq2, fq2, fq2), Fq12 = (fq6, fq6) — plain
pytrees, so they ride through jit/scan/select untouched.  Formulas are the
reference's (core/pairing/src/bls12_381/fq6.rs, fq12.rs — Karatsuba /
Toom-ish schoolbook with xi = 1+u non-residue folding), transcribed onto
the FqOps/Fq2Ops adapters so every Fq mul routes through the shared
Pallas/XLA kernel path.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ff import limbs as L
from ..mirror import field as mf
from .fields import Fq2Ops, FqOps

FQ = L.FQ

# ------------------------------------------------------------------ fq2
fq2_add = Fq2Ops.add
fq2_sub = Fq2Ops.sub
fq2_neg = Fq2Ops.neg
fq2_mul = Fq2Ops.mul
fq2_sqr = Fq2Ops.sqr


def fq2_conj(a):
    return (a[0], FqOps.neg(a[1]))


def fq2_mul_fq(a, s):
    """Multiply both components by an Fq element."""
    return (FqOps.mul(a[0], s), FqOps.mul(a[1], s))


def fq2_mul_small(a, k: int):
    """Multiply by a small positive integer via additions."""
    out = a
    for _ in range(k - 1):
        out = fq2_add(out, a)
    return out


def fq2_mul_by_nonresidue(a):
    """xi = 1 + u:  (c0 - c1) + (c0 + c1) u."""
    return (FqOps.sub(a[0], a[1]), FqOps.add(a[0], a[1]))


def fq2_const(v, batch_shape=None):
    """Host (c0, c1) int pair -> device mont pair (broadcastable)."""
    return (
        FqOps.from_ints([v[0]], (1,) if batch_shape is None else batch_shape),
        FqOps.from_ints([v[1]], (1,) if batch_shape is None else batch_shape),
    )


# ------------------------------------------------------------------ fq6
def fq6_add(a, b):
    return tuple(fq2_add(x, y) for x, y in zip(a, b))


def fq6_sub(a, b):
    return tuple(fq2_sub(x, y) for x, y in zip(a, b))


def fq6_neg(a):
    return tuple(fq2_neg(x) for x in a)


def fq6_mul_by_nonresidue(a):
    return (fq2_mul_by_nonresidue(a[2]), a[0], a[1])


def fq6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    v0 = fq2_mul(a0, b0)
    v1 = fq2_mul(a1, b1)
    v2 = fq2_mul(a2, b2)
    c0 = fq2_add(
        fq2_mul_by_nonresidue(
            fq2_sub(fq2_mul(fq2_add(a1, a2), fq2_add(b1, b2)),
                    fq2_add(v1, v2))
        ),
        v0,
    )
    c1 = fq2_add(
        fq2_sub(fq2_mul(fq2_add(a0, a1), fq2_add(b0, b1)), fq2_add(v0, v1)),
        fq2_mul_by_nonresidue(v2),
    )
    c2 = fq2_add(
        fq2_sub(fq2_mul(fq2_add(a0, a2), fq2_add(b0, b2)), fq2_add(v0, v2)),
        v1,
    )
    return (c0, c1, c2)


def fq6_sqr(a):
    return fq6_mul(a, a)


def fq6_inv(a):
    a0, a1, a2 = a
    c0 = fq2_sub(fq2_sqr(a0), fq2_mul_by_nonresidue(fq2_mul(a1, a2)))
    c1 = fq2_sub(fq2_mul_by_nonresidue(fq2_sqr(a2)), fq2_mul(a0, a1))
    c2 = fq2_sub(fq2_sqr(a1), fq2_mul(a0, a2))
    t = fq2_inv(
        fq2_add(
            fq2_mul_by_nonresidue(fq2_add(fq2_mul(a2, c1), fq2_mul(a1, c2))),
            fq2_mul(a0, c0),
        )
    )
    return (fq2_mul(t, c0), fq2_mul(t, c1), fq2_mul(t, c2))


def fq2_inv(a):
    norm = FqOps.add(FqOps.sqr(a[0]), FqOps.sqr(a[1]))
    shape = norm.shape
    t = L.batch_inv_mont(FQ, norm.reshape(FQ.n, -1), axis=1).reshape(shape)
    return (FqOps.mul(a[0], t), FqOps.neg(FqOps.mul(a[1], t)))


# ----------------------------------------------------------------- fq12
def fq12_one(batch=()):
    z2 = Fq2Ops.zeros(batch)
    o2 = Fq2Ops.ones(batch)
    return ((o2, z2, z2), (z2, z2, z2))


def fq12_conj(a):
    return (a[0], fq6_neg(a[1]))


def fq12_mul(a, b):
    aa = fq6_mul(a[0], b[0])
    bb = fq6_mul(a[1], b[1])
    o = fq6_mul(fq6_add(a[0], a[1]), fq6_add(b[0], b[1]))
    return (
        fq6_add(fq6_mul_by_nonresidue(bb), aa),
        fq6_sub(fq6_sub(o, aa), bb),
    )


def fq12_sqr(a):
    ab = fq6_mul(a[0], a[1])
    c0c1 = fq6_add(a[0], a[1])
    c0 = fq6_sub(
        fq6_sub(fq6_mul(fq6_add(fq6_mul_by_nonresidue(a[1]), a[0]), c0c1),
                ab),
        fq6_mul_by_nonresidue(ab),
    )
    return (c0, fq6_add(ab, ab))


def fq12_inv(a):
    t = fq6_inv(fq6_sub(fq6_sqr(a[0]), fq6_mul_by_nonresidue(fq6_sqr(a[1]))))
    return (fq6_mul(a[0], t), fq6_neg(fq6_mul(a[1], t)))


def fq12_mul_by_014(a, c0, c1, c4):
    """Sparse line multiplication (Miller ell shape): b = (c0, c1, 0; 0, c4, 0)."""
    z2 = tuple(jnp.zeros_like(x) for x in c0)
    return fq12_mul(a, ((c0, c1, z2), (z2, c4, z2)))


# ------------------------------------------------------------- frobenius
def _frob_tables(batch_shape):
    f6c1 = [fq2_const(v, batch_shape) for v in mf.FROBENIUS_COEFF_FQ6_C1]
    f6c2 = [fq2_const(v, batch_shape) for v in mf.FROBENIUS_COEFF_FQ6_C2]
    f12 = [fq2_const(v, batch_shape) for v in mf.FROBENIUS_COEFF_FQ12_C1]
    return f6c1, f6c2, f12


def fq2_frobenius(a, power: int):
    return fq2_conj(a) if power % 2 else a


def fq6_frobenius(a, power: int):
    p = power % 6
    f6c1, f6c2, _ = _frob_tables(None)
    return (
        fq2_frobenius(a[0], p),
        fq2_mul(fq2_frobenius(a[1], p), f6c1[p]),
        fq2_mul(fq2_frobenius(a[2], p), f6c2[p]),
    )


def fq12_frobenius(a, power: int):
    p = power % 12
    _, _, f12 = _frob_tables(None)
    c0 = fq6_frobenius(a[0], p)
    c1 = fq6_frobenius(a[1], p)
    c1 = tuple(fq2_mul(x, f12[p]) for x in c1)
    return (c0, c1)


# ------------------------------------------------------------- host glue
def fq12_from_ints(v, batch_shape=None):
    """Nested host int tuples ((3×fq2), (3×fq2)) -> device arrays."""
    return tuple(
        tuple(fq2_const(c, batch_shape) for c in half) for half in v
    )


def fq12_to_ints(a, index=0):
    """Device Fq12 -> host nested int tuples (one batch element)."""
    def fq2_out(x):
        c0 = L.from_limbs(FQ, x[0].reshape(FQ.n, -1), mont=True)[index]
        c1 = L.from_limbs(FQ, x[1].reshape(FQ.n, -1), mont=True)[index]
        return (c0, c1)

    return tuple(tuple(fq2_out(c) for c in half) for half in a)
