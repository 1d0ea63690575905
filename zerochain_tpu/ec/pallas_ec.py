"""Fused Pallas TPU kernels for the G1 Jacobian group law.

One `pallas_call` computes a complete-by-masking Jacobian add (or double)
with every field intermediate held in VMEM, instead of the ~26 separate
mont_mul kernel dispatches the composed path issues — cutting HBM traffic
per point-add from ~20 KB to ~1.2 KB (the MSM inner loop is HBM-bound) and
shrinking the MSM XLA module from ~1200 custom-calls to ~30.

Formulas match ec/weierstrass.py exactly (add-2007-bl / dbl-2009-l with
masked degenerate cases, reference semantics core/pairing/src/bls12_381/
ec.rs:300-530); field arithmetic reuses the unrolled 12-bit-limb REDC
primitives of ff/pallas_ff.py.  Layout: coordinates are (n_limbs, rows,
128) int32 planes, batch bucketed by pallas_ff._to_tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ff import limbs as L
from ..ff import pallas_ff as PF
from ..mirror.field import Q

FQ = L.FQ


def _ctx(n: int, p_int: int):
    """In-kernel field helpers over lists of (8, 128) limb planes."""
    p = PF._limbs_of(p_int, n)
    r_full = 1 << (PF.LIMB_BITS * n)
    pp = PF._limbs_of((-pow(p_int, -1, r_full)) % r_full, n)
    one_mont = PF._limbs_of(pow(2, PF.LIMB_BITS * n, p_int), n)

    def fmul(a, b):
        t = PF._ripple(PF._school(a, b, n, 2 * n), 2 * n)
        return PF._redc(t, n, p, pp)

    def fsqr(a):
        t = PF._ripple(PF._school_sqr(a, n), 2 * n)
        return PF._redc(t, n, p, pp)

    def fadd(a, b):
        s = PF._ripple([a[k] + b[k] for k in range(n)], n)
        return PF._cond_sub_p(s, p, n)

    def fsub(a, b):
        d, borrow = PF._sub_borrow(a, b, n)
        wrapped = borrow.astype(bool)
        dp = PF._ripple([d[k] + p[k] for k in range(n)], n)
        return [jnp.where(wrapped, dp[k], d[k]) for k in range(n)]

    def fzero_mask(a):
        """(8,128) bool plane: element == 0."""
        acc = a[0]
        for k in range(1, n):
            acc = acc | a[k]
        return acc == 0

    def fsel(mask, a, b):
        """mask ? a : b, limb-plane-wise."""
        return [jnp.where(mask, x, y) for x, y in zip(a, b)]

    def fconst(limbs):
        return [jnp.full((1, 1), v, jnp.int32) for v in limbs]

    return dict(mul=fmul, sqr=fsqr, add=fadd, sub=fsub,
                zmask=fzero_mask, sel=fsel,
                zero=lambda: [jnp.zeros((1, 1), jnp.int32)] * n,
                one_mont=lambda: fconst(one_mont))


def _double_planes(c, X, Y, Z):
    """dbl-2009-l on limb-plane lists; infinity propagates via Z3=2YZ."""
    a = c["sqr"](X)
    b = c["sqr"](Y)
    cc = c["sqr"](b)
    t = c["sqr"](c["add"](X, b))
    d1 = c["sub"](c["sub"](t, a), cc)
    d = c["add"](d1, d1)
    e = c["add"](c["add"](a, a), a)
    f = c["sqr"](e)
    x3 = c["sub"](f, c["add"](d, d))
    c2 = c["add"](cc, cc)
    c4 = c["add"](c2, c2)
    c8 = c["add"](c4, c4)
    y3 = c["sub"](c["mul"](e, c["sub"](d, x3)), c8)
    yz = c["mul"](Y, Z)
    z3 = c["add"](yz, yz)
    return x3, y3, z3


@functools.lru_cache(maxsize=None)
def _g1_kernels():
    n = FQ.n
    c = _ctx(n, Q)

    def read(ref):
        return [ref[i] for i in range(n)]

    def write(ref, planes):
        for k in range(n):
            ref[k] = jnp.broadcast_to(planes[k], ref.shape[1:])

    def add_kernel(x1r, y1r, z1r, x2r, y2r, z2r, x3r, y3r, z3r):
        X1, Y1, Z1 = read(x1r), read(y1r), read(z1r)
        X2, Y2, Z2 = read(x2r), read(y2r), read(z2r)

        z1z1 = c["sqr"](Z1)
        z2z2 = c["sqr"](Z2)
        u1 = c["mul"](X1, z2z2)
        u2 = c["mul"](X2, z1z1)
        s1 = c["mul"](c["mul"](Y1, Z2), z2z2)
        s2 = c["mul"](c["mul"](Y2, Z1), z1z1)
        h = c["sub"](u2, u1)
        r = c["sub"](s2, s1)

        h2 = c["add"](h, h)
        i = c["sqr"](h2)
        j = c["mul"](h, i)
        r2 = c["add"](r, r)
        v = c["mul"](u1, i)
        x3 = c["sub"](c["sub"](c["sqr"](r2), j), c["add"](v, v))
        s1j = c["mul"](s1, j)
        y3 = c["sub"](c["mul"](r2, c["sub"](v, x3)), c["add"](s1j, s1j))
        zs = c["sqr"](c["add"](Z1, Z2))
        z3 = c["mul"](c["sub"](c["sub"](zs, z1z1), z2z2), h)

        p_inf = c["zmask"](Z1)
        q_inf = c["zmask"](Z2)
        x_eq = c["zmask"](h)
        y_eq = c["zmask"](r)

        dx, dy, dz = _double_planes(c, X1, Y1, Z1)
        zero = [jnp.zeros_like(X1[0])] * n
        onem = [jnp.broadcast_to(v, X1[0].shape)
                for v in c["one_mont"]()]

        res = (x3, y3, z3)
        # same point -> double
        both = x_eq & y_eq
        res = tuple(c["sel"](both, d, r_)
                    for d, r_ in zip((dx, dy, dz), res))
        # same x, different y (neither infinite) -> infinity
        to_inf = x_eq & (~y_eq) & ~(p_inf | q_inf)
        res = tuple(c["sel"](to_inf, i_, r_)
                    for i_, r_ in zip((onem, onem, zero), res))
        res = tuple(c["sel"](q_inf, a, r_)
                    for a, r_ in zip((X1, Y1, Z1), res))
        res = tuple(c["sel"](p_inf, b, r_)
                    for b, r_ in zip((X2, Y2, Z2), res))
        write(x3r, res[0])
        write(y3r, res[1])
        write(z3r, res[2])

    def double_kernel(x1r, y1r, z1r, x3r, y3r, z3r):
        X1, Y1, Z1 = read(x1r), read(y1r), read(z1r)
        x3, y3, z3 = _double_planes(c, X1, Y1, Z1)
        write(x3r, x3)
        write(y3r, y3)
        write(z3r, z3)

    block = pl.BlockSpec(
        (n, PF.SUBLANES, PF.LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )

    def build(kernel, n_in):
        @jax.jit
        def call(*args):
            tiles = args[0].shape[1] // PF.SUBLANES
            shape = args[0].shape
            return pl.pallas_call(
                kernel,
                grid=(tiles,),
                in_specs=[block] * n_in,
                out_specs=(block,) * 3,
                out_shape=tuple(
                    jax.ShapeDtypeStruct(shape, jnp.int32) for _ in range(3)
                ),
                interpret=PF.INTERPRET,
            )(*args)

        return call

    return {"add": build(add_kernel, 6), "double": build(double_kernel, 3)}


def _route(op: str, coords):
    """coords: list of (n, *batch) arrays -> op outputs as 3 arrays."""
    n = FQ.n
    tiled = []
    bshape = bsz = None
    for a in coords:
        t, bshape, bsz = PF._to_tiles(a, n)
        tiled.append(t)
    outs = _g1_kernels()[op](*tiled)
    return tuple(PF._from_tiles(o, bshape, bsz, n) for o in outs)


def g1_add(p, q):
    """Fused Jacobian add; drop-in for weierstrass.add(FqOps, p, q)."""
    shape = jnp.broadcast_shapes(*(a.shape for a in (*p, *q)))
    args = [jnp.broadcast_to(a, shape) for a in (*p, *q)]
    return _route("add", args)


def g1_double(p):
    shape = jnp.broadcast_shapes(*(a.shape for a in p))
    args = [jnp.broadcast_to(a, shape) for a in p]
    return _route("double", args)


def use_pallas(shapes) -> bool:
    """Trace-time routing for a G1 group op (same policy as pallas_ff)."""
    shape = jnp.broadcast_shapes(*shapes)
    return PF.use_pallas(shape)
