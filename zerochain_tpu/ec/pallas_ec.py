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

    # product-domain helpers for LAZY Fq2 reduction: a full Montgomery
    # mul is school (n^2 MACs) + REDC (2n^2); Karatsuba Fq2 combines
    # the three UNREDUCED 2n-limb products first and pays only 2 REDCs
    # instead of 3 (9n^2 -> 7n^2 per Fq2 mul, ~-22%).  2p^2 is added
    # before the subtractions to keep the combine non-negative
    # (operands < p so each product < p^2); REDC stays exact for
    # t < 3p^2 << R*p.
    def fmul_t(a, b):
        return PF._ripple(PF._school(a, b, n, 2 * n), 2 * n)

    def fredc2(t):
        return PF._redc(t, n, p, pp)

    two_p2 = PF._limbs_of(2 * p_int * p_int, 2 * n)

    return dict(mul=fmul, sqr=fsqr, add=fadd, sub=fsub,
                zmask=fzero_mask, sel=fsel,
                zero=lambda: [jnp.zeros((1, 1), jnp.int32)] * n,
                one_mont=lambda: fconst(one_mont),
                mul_t=fmul_t, redc2=fredc2, two_p2=two_p2, n_limbs=n)


def _fq2_ctx(c):
    """Fq2 helpers over pairs of plane lists (u^2 = -1, Karatsuba,
    lazy reduction: 2 REDCs per mul instead of 3)."""

    def mul(a, b):
        n2 = 2 * c["n_limbs"]
        K = c["two_p2"]
        t_aa = c["mul_t"](a[0], b[0])
        t_bb = c["mul_t"](a[1], b[1])
        t_o = c["mul_t"](c["add"](a[0], a[1]), c["add"](b[0], b[1]))
        d0 = PF._ripple_signed(
            [t_aa[k] + K[k] - t_bb[k] for k in range(n2)], n2
        )
        d1 = PF._ripple_signed(
            [t_o[k] + K[k] - t_aa[k] - t_bb[k] for k in range(n2)], n2
        )
        return (c["redc2"](d0), c["redc2"](d1))

    def sqr(a):
        ab = c["mul"](a[0], a[1])
        c0 = c["mul"](c["add"](a[0], a[1]), c["sub"](a[0], a[1]))
        return (c0, c["add"](ab, ab))

    def add(a, b):
        return (c["add"](a[0], b[0]), c["add"](a[1], b[1]))

    def sub(a, b):
        return (c["sub"](a[0], b[0]), c["sub"](a[1], b[1]))

    def zmask(a):
        return c["zmask"](a[0]) & c["zmask"](a[1])

    def sel(mask, a, b):
        return (c["sel"](mask, a[0], b[0]), c["sel"](mask, a[1], b[1]))

    return dict(mul=mul, sqr=sqr, add=add, sub=sub, zmask=zmask, sel=sel)


def _double_planes(c, X, Y, Z):
    """dbl-2009-l on plane lists/pairs; infinity propagates via Z3=2YZ."""
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


def _add_planes(c, P, Q, onem, zero):
    """add-2007-bl + masked degenerate cases, field-generic."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
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

    dbl = _double_planes(c, X1, Y1, Z1)

    res = (x3, y3, z3)
    # same point -> double
    both = x_eq & y_eq
    res = tuple(c["sel"](both, d, r_) for d, r_ in zip(dbl, res))
    # same x, different y (neither infinite) -> infinity
    to_inf = x_eq & (~y_eq) & ~(p_inf | q_inf)
    res = tuple(c["sel"](to_inf, i_, r_)
                for i_, r_ in zip((onem, onem, zero), res))
    res = tuple(c["sel"](q_inf, a, r_) for a, r_ in zip(P, res))
    res = tuple(c["sel"](p_inf, b, r_) for b, r_ in zip(Q, res))
    return res


def _madd_planes(c, P, Q, onem, zero):
    """Mixed add: Q's Z is restricted to {0 (infinity), one_mont}.

    madd-2007-bl specialization of _add_planes — 8M+3S instead of
    11M+5S (~-30% VPU work).  This is exactly the shape of the MSM depth
    scan: the running prefix is a general Jacobian point, the incoming
    point is an affine CRS entry (Z=1) or zero padding (Z=0).  The
    degenerate-case masking is unchanged (p_inf/q_inf selects win over
    the algebraic result, so garbage computed off a zero operand never
    escapes)."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    z1z1 = c["sqr"](Z1)
    u2 = c["mul"](X2, z1z1)
    s2 = c["mul"](c["mul"](Y2, Z1), z1z1)
    h = c["sub"](u2, X1)          # U1 = X1 (Z2 = 1)
    r = c["sub"](s2, Y1)          # S1 = Y1
    h2 = c["add"](h, h)
    i = c["sqr"](h2)
    j = c["mul"](h, i)
    r2 = c["add"](r, r)
    v = c["mul"](X1, i)
    x3 = c["sub"](c["sub"](c["sqr"](r2), j), c["add"](v, v))
    s1j = c["mul"](Y1, j)
    y3 = c["sub"](c["mul"](r2, c["sub"](v, x3)), c["add"](s1j, s1j))
    z1h = c["mul"](Z1, h)
    z3 = c["add"](z1h, z1h)       # ((Z1+1)^2 - Z1Z1 - 1)*H = 2*Z1*H

    p_inf = c["zmask"](Z1)
    q_inf = c["zmask"](Z2)
    x_eq = c["zmask"](h)
    y_eq = c["zmask"](r)

    dbl = _double_planes(c, X1, Y1, Z1)

    res = (x3, y3, z3)
    both = x_eq & y_eq
    res = tuple(c["sel"](both, d, r_) for d, r_ in zip(dbl, res))
    to_inf = x_eq & (~y_eq) & ~(p_inf | q_inf)
    res = tuple(c["sel"](to_inf, i_, r_)
                for i_, r_ in zip((onem, onem, zero), res))
    res = tuple(c["sel"](q_inf, a, r_) for a, r_ in zip(P, res))
    res = tuple(c["sel"](p_inf, b, r_) for b, r_ in zip(Q, res))
    return res


def _build_kernels(ncomp: int):
    """ncomp=1 -> G1 (Fq coords), ncomp=2 -> G2 (Fq2 coords).

    Kernel refs: ncomp arrays per coordinate, 3 coords in (+3 more for
    add's second point), 3*ncomp outputs."""
    n = FQ.n
    base = _ctx(n, Q)
    c = base if ncomp == 1 else _fq2_ctx(base)

    def read(refs):
        if ncomp == 1:
            return [refs[0][i] for i in range(n)]
        return ([refs[0][i] for i in range(n)],
                [refs[1][i] for i in range(n)])

    def write(refs, val):
        comps = [val] if ncomp == 1 else list(val)
        for ref, planes in zip(refs, comps):
            for k in range(n):
                ref[k] = jnp.broadcast_to(planes[k], ref.shape[1:])

    def consts(like_plane):
        zero1 = [jnp.zeros_like(like_plane)] * n
        onem1 = [jnp.broadcast_to(v, like_plane.shape)
                 for v in [jnp.full((1, 1), lv, jnp.int32)
                           for lv in PF._limbs_of(
                               pow(2, PF.LIMB_BITS * n, Q), n)]]
        if ncomp == 1:
            return onem1, zero1
        return (onem1, zero1), (zero1, [x for x in zero1])

    def add_kernel(*refs):
        ins, outs = refs[: 6 * ncomp], refs[6 * ncomp :]
        P = tuple(read(ins[i * ncomp : (i + 1) * ncomp]) for i in range(3))
        Qp = tuple(read(ins[(3 + i) * ncomp : (4 + i) * ncomp])
                   for i in range(3))
        like = ins[0][0]
        onem, zero = consts(like)
        res = _add_planes(c, P, Qp, onem, zero)
        for i in range(3):
            write(outs[i * ncomp : (i + 1) * ncomp], res[i])

    def double_kernel(*refs):
        ins, outs = refs[: 3 * ncomp], refs[3 * ncomp :]
        P = tuple(read(ins[i * ncomp : (i + 1) * ncomp]) for i in range(3))
        res = _double_planes(c, *P)
        for i in range(3):
            write(outs[i * ncomp : (i + 1) * ncomp], res[i])

    block = pl.BlockSpec(
        (n, PF.SUBLANES, PF.LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )

    def build(kernel, n_in):
        @jax.jit
        def call(*args):
            tiles = args[0].shape[1] // PF.SUBLANES
            shape = args[0].shape
            n_out = 3 * ncomp
            return pl.pallas_call(
                kernel,
                grid=(tiles,),
                in_specs=[block] * n_in,
                out_specs=(block,) * n_out,
                out_shape=tuple(
                    jax.ShapeDtypeStruct(shape, jnp.int32)
                    for _ in range(n_out)
                ),
                interpret=PF.INTERPRET,
            )(*args)

        return call

    def add2sel_kernel(*refs):
        """Hillis-Steele segmented-scan level body, fully fused:
        out = keep ? x : (f ? x : add(xl, x))."""
        ins, outs = refs[: 6 * ncomp + 2], refs[6 * ncomp + 2 :]
        XL = tuple(read(ins[i * ncomp : (i + 1) * ncomp]) for i in range(3))
        X = tuple(read(ins[(3 + i) * ncomp : (4 + i) * ncomp])
                  for i in range(3))
        f_ref, keep_ref = ins[6 * ncomp], ins[6 * ncomp + 1]
        like = ins[0][0]
        onem, zero = consts(like)
        merged = _add_planes(c, XL, X, onem, zero)
        f = f_ref[0] != 0
        keep = keep_ref[0] != 0
        passthru = f | keep
        res = tuple(c["sel"](passthru, xc, mc) for xc, mc in zip(X, merged))
        for i in range(3):
            write(outs[i * ncomp : (i + 1) * ncomp], res[i])

    mask_block = pl.BlockSpec(
        (1, PF.SUBLANES, PF.LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )

    def build_add2sel():
        @jax.jit
        def call(*args):
            tiles = args[0].shape[1] // PF.SUBLANES
            shape = args[0].shape
            n_out = 3 * ncomp
            return pl.pallas_call(
                add2sel_kernel,
                grid=(tiles,),
                in_specs=[block] * (6 * ncomp) + [mask_block] * 2,
                out_specs=(block,) * n_out,
                out_shape=tuple(
                    jax.ShapeDtypeStruct(shape, jnp.int32)
                    for _ in range(n_out)
                ),
                interpret=PF.INTERPRET,
            )(*args)

        return call

    return {
        "add": build(add_kernel, 6 * ncomp),
        "double": build(double_kernel, 3 * ncomp),
        "add2sel": build_add2sel(),
    }


@functools.lru_cache(maxsize=None)
def _kernels(ncomp: int):
    return _build_kernels(ncomp)


def _flatten_pt(p, ncomp):
    """Point tuple -> flat list of component arrays (x0[,x1], y0[,y1], ...)."""
    out = []
    for coord in p:
        if ncomp == 1:
            out.append(coord)
        else:
            out.extend(coord)
    return out


def _unflatten_pt(arrs, ncomp):
    if ncomp == 1:
        return tuple(arrs)
    return tuple((arrs[2 * i], arrs[2 * i + 1]) for i in range(3))


def _route(op: str, arrs, ncomp: int):
    n = FQ.n
    shape = jnp.broadcast_shapes(*(a.shape for a in arrs))
    tiled = []
    bshape = bsz = None
    for a in arrs:
        t, bshape, bsz = PF._to_tiles(jnp.broadcast_to(a, shape), n)
        tiled.append(t)
    outs = _kernels(ncomp)[op](*tiled)
    flat = [PF._from_tiles(o, bshape, bsz, n) for o in outs]
    return _unflatten_pt(flat, ncomp)


def g1_add(p, q):
    """Fused Jacobian add; drop-in for weierstrass.add(FqOps, p, q)."""
    return _route("add", _flatten_pt(p, 1) + _flatten_pt(q, 1), 1)


def g1_double(p):
    return _route("double", _flatten_pt(p, 1), 1)


def g2_add(p, q):
    """Fused Jacobian add over Fq2 coordinate pairs (G2)."""
    return _route("add", _flatten_pt(p, 2) + _flatten_pt(q, 2), 2)


def g2_double(p):
    return _route("double", _flatten_pt(p, 2), 2)


def hs_add_select(F_name: str, xl, x, f, keep):
    """Fused Hillis-Steele level: keep/f-masked add(xl, x) (see kernel).

    xl/x: point tuples; f/keep: bool arrays over the point batch shape."""
    n = FQ.n
    ncomp = 1 if F_name == "fq" else 2
    arrs = _flatten_pt(xl, ncomp) + _flatten_pt(x, ncomp)
    shape = jnp.broadcast_shapes(*(a.shape for a in arrs))
    batch = shape[1:]
    tiled = []
    bshape = bsz = None
    for a in arrs:
        t, bshape, bsz = PF._to_tiles(jnp.broadcast_to(a, shape), n)
        tiled.append(t)
    for m in (f, keep):
        mi = jnp.broadcast_to(m, batch).astype(jnp.int32)[None]
        t, _, _ = PF._to_tiles(mi, 1)
        tiled.append(t)
    outs = _kernels(ncomp)["add2sel"](*tiled)
    flat = [PF._from_tiles(o, bshape, bsz, n) for o in outs]
    return _unflatten_pt(flat, ncomp)


def _leaf_shapes(pts):
    for coord in pts:
        if isinstance(coord, tuple):
            yield from (c.shape for c in coord)
        else:
            yield coord.shape


def use_pallas(shapes) -> bool:
    """Trace-time routing for a fused group op (same policy as pallas_ff)."""
    shape = jnp.broadcast_shapes(*shapes)
    return PF.use_pallas(shape)
