"""Device (jnp) BLS12-381 optimal-ate pairing, batched over proofs.

The reference computes pairings one scalar word at a time on the CPU
(core/pairing/src/bls12_381/mod.rs:40-160, G2Prepared steps mod.rs:168-359);
here the Miller loop and final exponentiation are lax.scans over the fixed
64-bit BLS_X schedule, batched over a trailing proof axis — one compact
graph regardless of how many proofs are verified at once.  The loop/step
structure (eprint 2010/354 algorithms 26/27) matches the host mirror
(mirror/pairing.py), which is pinned to the reference's RELIC golden
vector.

Used for batched proof verification and prepare_verifying_key; throughput
demands are modest (SURVEY.md §7 step 5), so clarity over Pallas here.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ff import limbs as L
from ..mirror.field import BLS_X
from .fields import Fq2Ops, FqOps
from . import tower as T

FQ = L.FQ

# MSB-first bits of BLS_X >> 1 with the leading one skipped: the shared
# iteration schedule of g2_prepare and the Miller loop (62 iterations).
_XBITS = [(BLS_X >> 1 >> i) & 1 for i in range(63, -1, -1)]
_SKIP = _XBITS.index(1) + 1
_SCHED = np.asarray(_XBITS[_SKIP:], dtype=bool)  # (62,)


def _dbl(x):
    return T.fq2_add(x, x)


def _sel(cond, a, b):
    return jax.tree.map(lambda x, y: jnp.where(cond, x, y), a, b)


def _doubling_step(rx, ry, rz):
    """One Miller doubling step; returns (new R, line coeffs)."""
    tmp0 = T.fq2_sqr(rx)
    tmp1 = T.fq2_sqr(ry)
    tmp2 = T.fq2_sqr(tmp1)
    tmp3 = _dbl(
        T.fq2_sub(T.fq2_sub(T.fq2_sqr(T.fq2_add(tmp1, rx)), tmp0), tmp2)
    )
    tmp4 = T.fq2_mul_small(tmp0, 3)
    tmp6 = T.fq2_add(rx, tmp4)
    tmp5 = T.fq2_sqr(tmp4)
    zsq = T.fq2_sqr(rz)
    nrx = T.fq2_sub(T.fq2_sub(tmp5, tmp3), tmp3)
    nrz = T.fq2_sub(T.fq2_sub(T.fq2_sqr(T.fq2_add(rz, ry)), tmp1), zsq)
    nry = T.fq2_sub(
        T.fq2_mul(T.fq2_sub(tmp3, nrx), tmp4), T.fq2_mul_small(tmp2, 8)
    )
    c0 = T.fq2_neg(_dbl(T.fq2_mul(tmp4, zsq)))
    c2 = T.fq2_sub(
        T.fq2_sub(T.fq2_sqr(tmp6), tmp0),
        T.fq2_add(tmp5, T.fq2_mul_small(tmp1, 4)),
    )
    c_last = _dbl(T.fq2_mul(nrz, zsq))
    return (nrx, nry, nrz), (c_last, c0, c2)


def _addition_step(rx, ry, rz, qx, qy):
    """One Miller addition step vs the affine base Q."""
    zsq = T.fq2_sqr(rz)
    ysq = T.fq2_sqr(qy)
    t0 = T.fq2_mul(zsq, qx)
    t1 = T.fq2_mul(
        T.fq2_sub(T.fq2_sub(T.fq2_sqr(T.fq2_add(qy, rz)), ysq), zsq), zsq
    )
    t2 = T.fq2_sub(t0, rx)
    t3 = T.fq2_sqr(t2)
    t4 = T.fq2_mul_small(t3, 4)
    t5 = T.fq2_mul(t4, t2)
    t6 = T.fq2_sub(T.fq2_sub(t1, ry), ry)
    t9 = T.fq2_mul(t6, qx)
    t7 = T.fq2_mul(t4, rx)
    nrx = T.fq2_sub(T.fq2_sub(T.fq2_sub(T.fq2_sqr(t6), t5), t7), t7)
    nrz = T.fq2_sub(T.fq2_sub(T.fq2_sqr(T.fq2_add(rz, t2)), zsq), t3)
    t10 = T.fq2_add(qy, nrz)
    t8 = T.fq2_mul(T.fq2_sub(t7, nrx), t6)
    t0 = _dbl(T.fq2_mul(ry, t5))
    nry = T.fq2_sub(t8, t0)
    t10 = T.fq2_sub(T.fq2_sub(T.fq2_sqr(t10), ysq), T.fq2_sqr(nrz))
    t9 = T.fq2_sub(_dbl(t9), t10)
    t10 = _dbl(nrz)
    t1 = _dbl(T.fq2_neg(t6))
    return (nrx, nry, nrz), (t10, t1, t9)


def g2_prepare(qx, qy):
    """Line coefficients for affine G2 bases (each coord an Fq2 with any
    trailing batch shape).  Returns (dbl_coeffs[62], add_coeffs[62],
    final_coeffs) pytrees with a leading step axis on the first two."""
    one = Fq2Ops.ones(Fq2Ops.batch_shape(qx))
    sched = jnp.asarray(_SCHED)

    def step(carry, bit):
        r = carry
        r_dbl, c_dbl = _doubling_step(*r)
        r_add, c_add = _addition_step(*r_dbl, qx, qy)
        r_new = _sel(bit, r_add, r_dbl)
        return r_new, (c_dbl, c_add)

    r_final, coeffs = jax.lax.scan(step, (qx, qy, one), sched)
    _, c_final = _doubling_step(*r_final)
    return coeffs[0], coeffs[1], c_final


def _ell(f, coeffs, px, py):
    c0 = T.fq2_mul_fq(coeffs[0], py)
    c1 = T.fq2_mul_fq(coeffs[1], px)
    return T.fq12_mul_by_014(f, coeffs[2], c1, c0)


def miller_loop(pairs):
    """pairs: list of ((px, py), (dbl, add, final)) with px/py Fq arrays
    and prepared G2 coefficients.  Returns an Fq12 (conjugated: BLS_X<0)."""
    batch = FqOps.batch_shape(pairs[0][0][0])
    f0 = T.fq12_one(batch)
    sched = jnp.asarray(_SCHED)

    def step(f, xs):
        bit = xs[0]
        per_pair = xs[1]
        for (p, _), (c_dbl, c_add) in zip(pairs, per_pair):
            f = _ell(f, c_dbl, p[0], p[1])
            f = _sel(bit, _ell(f, c_add, p[0], p[1]), f)
        return T.fq12_sqr(f), None

    xs = (sched, [(c[0], c[1]) for _, c in pairs])
    f, _ = jax.lax.scan(step, f0, xs)
    for (p, c) in pairs:
        f = _ell(f, c[2], p[0], p[1])
    return T.fq12_conj(f)


def _pow_scan_impl(f, bits):
    """f^e by MSB-first square-and-multiply over a traced bit vector."""

    def step(acc, bit):
        acc = T.fq12_sqr(acc)
        return _sel(bit, T.fq12_mul(acc, f), acc), None

    batch = FqOps.batch_shape(f[0][0][0])
    acc, _ = jax.lax.scan(step, T.fq12_one(batch), bits)
    return acc


# Dispatch as SEPARATE jits (shared, shape-cached) rather than one
# monolithic pairing graph: final exponentiation alone inlines ~20 fq12
# ops + five scan copies if traced whole, which blows XLA:CPU compile
# time from seconds to tens of minutes.  Each piece below is compact and
# reused across calls (the two pow-scan bit lengths hit one cache entry
# each; every fq12 op compiles once per batch shape).
_pow_scan_j = jax.jit(_pow_scan_impl)
_g2_prepare_j = jax.jit(g2_prepare)
_fq12_mul_j = jax.jit(T.fq12_mul)
_fq12_sqr_j = jax.jit(T.fq12_sqr)
_fq12_inv_j = jax.jit(T.fq12_inv)
_fq12_frob_j = jax.jit(T.fq12_frobenius, static_argnums=1)


def _pow_static(f, exponent: int, n_bits: int):
    bits = jnp.asarray(
        [(exponent >> i) & 1 for i in range(n_bits - 1, -1, -1)], bool
    )
    return _pow_scan_j(f, bits)


def _exp_by_x(f):
    return T.fq12_conj(_pow_static(f, BLS_X, 64))  # x is negative


def final_exponentiation(r):
    """mod.rs:104-160.  Assumes r != 0 (true for Miller outputs of valid
    points).  Composes the cached per-op jits above."""
    f1 = T.fq12_conj(r)
    f2 = _fq12_inv_j(r)
    rr = _fq12_mul_j(f1, f2)
    f2 = rr
    rr = _fq12_mul_j(_fq12_frob_j(rr, 2), f2)

    y0 = _fq12_sqr_j(rr)
    y1 = _exp_by_x(y0)
    y2 = T.fq12_conj(_pow_static(y1, BLS_X >> 1, 63))
    y3 = T.fq12_conj(rr)
    y1 = _fq12_mul_j(y1, y3)
    y1 = T.fq12_conj(y1)
    y1 = _fq12_mul_j(y1, y2)
    y2 = _exp_by_x(y1)
    y3 = _exp_by_x(y2)
    y1 = T.fq12_conj(y1)
    y3 = _fq12_mul_j(y3, y1)
    y1 = T.fq12_conj(y1)
    y1 = _fq12_frob_j(y1, 3)
    y2 = _fq12_frob_j(y2, 2)
    y1 = _fq12_mul_j(y1, y2)
    y2 = _exp_by_x(y3)
    y2 = _fq12_mul_j(y2, y0)
    y2 = _fq12_mul_j(y2, rr)
    y1 = _fq12_mul_j(y1, y2)
    y2 = _fq12_frob_j(y3, 1)
    return _fq12_mul_j(y1, y2)


_miller_one_j = jax.jit(
    lambda px, py, coeffs: miller_loop([((px, py), coeffs)])
)


def pairing(px, py, qx, qy):
    """e(P, Q) on device arrays (trailing batch axes ride through)."""
    coeffs = _g2_prepare_j(qx, qy)
    return final_exponentiation(_miller_one_j(px, py, coeffs))


def pairing_host(p, q):
    """e(P, Q) for host affine ints; returns host Fq12 nested int tuples."""
    px = FqOps.from_ints([p[0]])
    py = FqOps.from_ints([p[1]])
    qx = Fq2Ops.from_ints([q[0]])
    qy = Fq2Ops.from_ints([q[1]])
    return T.fq12_to_ints(pairing(px, py, qx, qy))
