"""Batched short-Weierstrass group law in Jacobian coordinates (y^2 = x^3 + b).

Branch-free: the degenerate cases of the reference's Jacobian add/double
(core/pairing/src/bls12_381/ec.rs:300-530 — infinity, P == Q, P == -Q) are
handled with masked selects over the whole batch, so everything traces into
a static XLA graph.  Points: (X, Y, Z) field elements; infinity <=> Z == 0.
Generic over the field adapter (ec/fields.py) — instantiated for G1 and G2.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(F, batch=()):
    return (F.ones(batch), F.ones(batch), F.zeros(batch))


def is_identity(F, p):
    return F.is_zero(p[2])


def neg(F, p):
    return (p[0], F.neg(p[1]), p[2])


def _fused(F, pts) -> bool:
    """Route group ops through the fused Pallas kernels (ec/pallas_ec.py)."""
    if getattr(F, "name", "") not in ("fq", "fq2"):
        return False
    from . import pallas_ec

    return pallas_ec.use_pallas(list(pallas_ec._leaf_shapes(pts)))


def double(F, p):
    """dbl-2009-l; infinity propagates (Z3 = 2YZ = 0)."""
    if _fused(F, p):
        from . import pallas_ec

        fn = pallas_ec.g1_double if F.name == "fq" else pallas_ec.g2_double
        return fn(p)
    X, Y, Z = p
    a = F.sqr(X)
    b = F.sqr(Y)
    c = F.sqr(b)
    t = F.sqr(F.add(X, b))
    d = F.add(F.sub(F.sub(t, a), c), F.sub(F.sub(t, a), c))
    e = F.add(F.add(a, a), a)
    f = F.sqr(e)
    x3 = F.sub(f, F.add(d, d))
    c8 = F.add(F.add(F.add(c, c), F.add(c, c)), F.add(F.add(c, c), F.add(c, c)))
    y3 = F.sub(F.mul(e, F.sub(d, x3)), c8)
    z3 = F.add(F.mul(Y, Z), F.mul(Y, Z))
    return (x3, y3, z3)


def add(F, p, q):
    """Complete-by-masking Jacobian addition (add-2007-bl + cases)."""
    if _fused(F, (*p, *q)):
        from . import pallas_ec

        fn = pallas_ec.g1_add if F.name == "fq" else pallas_ec.g2_add
        return fn(p, q)
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    z1z1 = F.sqr(Z1)
    z2z2 = F.sqr(Z2)
    u1 = F.mul(X1, z2z2)
    u2 = F.mul(X2, z1z1)
    s1 = F.mul(F.mul(Y1, Z2), z2z2)
    s2 = F.mul(F.mul(Y2, Z1), z1z1)
    h = F.sub(u2, u1)
    r = F.sub(s2, s1)

    i = F.sqr(F.add(h, h))
    j = F.mul(h, i)
    r2 = F.add(r, r)
    v = F.mul(u1, i)
    x3 = F.sub(F.sub(F.sqr(r2), j), F.add(v, v))
    s1j = F.mul(s1, j)
    y3 = F.sub(F.mul(r2, F.sub(v, x3)), F.add(s1j, s1j))
    z3 = F.mul(F.sub(F.sqr(F.add(Z1, Z2)), F.add(z1z1, z2z2)), h)

    p_inf = is_identity(F, p)
    q_inf = is_identity(F, q)
    x_eq = F.is_zero(h)
    y_eq = F.is_zero(r)

    dbl = double(F, p)
    inf = identity(F, F.batch_shape(X1))

    # same x, different y -> infinity; same point -> double
    res = (x3, y3, z3)
    res = tuple(
        F.select(jnp.logical_and(x_eq, y_eq), d, r_)
        for d, r_ in zip(dbl, res)
    )
    res = tuple(
        F.select(
            jnp.logical_and(
                jnp.logical_and(x_eq, jnp.logical_not(y_eq)),
                jnp.logical_not(jnp.logical_or(p_inf, q_inf)),
            ),
            i_,
            r_,
        )
        for i_, r_ in zip(inf, res)
    )
    res = tuple(F.select(q_inf, a, r_) for a, r_ in zip(p, res))
    res = tuple(F.select(p_inf, b, r_) for b, r_ in zip(q, res))
    return res


def add_mixed(F, p, q_affine, q_inf=None):
    """p (Jacobian) + q (affine, Z=1); q_inf optionally marks infinities in q."""
    X1, Y1, Z1 = p
    X2, Y2 = q_affine
    z1z1 = F.sqr(Z1)
    u2 = F.mul(X2, z1z1)
    s2 = F.mul(F.mul(Y2, Z1), z1z1)
    h = F.sub(u2, X1)
    r = F.sub(s2, Y1)

    hh = F.sqr(h)
    i = F.add(F.add(hh, hh), F.add(hh, hh))
    j = F.mul(h, i)
    r2 = F.add(r, r)
    v = F.mul(X1, i)
    x3 = F.sub(F.sub(F.sqr(r2), j), F.add(v, v))
    y1j = F.mul(Y1, j)
    y3 = F.sub(F.mul(r2, F.sub(v, x3)), F.add(y1j, y1j))
    z3 = F.sub(F.sqr(F.add(Z1, h)), F.add(z1z1, hh))

    p_inf = is_identity(F, p)
    x_eq = F.is_zero(h)
    y_eq = F.is_zero(r)

    dbl = double(F, p)
    inf = identity(F, F.batch_shape(X1))
    q_jac = (X2, Y2, F.ones(F.batch_shape(X1)))

    res = (x3, y3, z3)
    res = tuple(
        F.select(jnp.logical_and(jnp.logical_and(x_eq, y_eq), jnp.logical_not(p_inf)), d, r_)
        for d, r_ in zip(dbl, res)
    )
    res = tuple(
        F.select(
            jnp.logical_and(
                jnp.logical_and(x_eq, jnp.logical_not(y_eq)),
                jnp.logical_not(p_inf),
            ),
            i_,
            r_,
        )
        for i_, r_ in zip(inf, res)
    )
    res = tuple(F.select(p_inf, b, r_) for b, r_ in zip(q_jac, res))
    if q_inf is not None:
        res = tuple(F.select(q_inf, a, r_) for a, r_ in zip(p, res))
    return res


def select(F, cond, p, q):
    return tuple(F.select(cond, a, b) for a, b in zip(p, q))


def normalize(F, p):
    """Jacobian -> affine via batched inversion; infinity -> (0, 0).

    Returns (x, y, inf_mask)."""
    X, Y, Z = p
    batch = F.batch_shape(X)
    inf = is_identity(F, p)
    # replace Z=0 by 1 to keep the batch inverse well-defined
    zsafe = F.select(inf, F.ones(batch), Z)
    if hasattr(zsafe, "reshape"):
        flat = zsafe.reshape(zsafe.shape[0], -1)
        zinv = F.batch_inv_flat(flat).reshape(zsafe.shape)
    else:  # Fq2 tuple
        shape = zsafe[0].shape
        flat = (zsafe[0].reshape(shape[0], -1), zsafe[1].reshape(shape[0], -1))
        zi = F.batch_inv_flat(flat)
        zinv = (zi[0].reshape(shape), zi[1].reshape(shape))
    zinv2 = F.sqr(zinv)
    zinv3 = F.mul(zinv2, zinv)
    x = F.mul(X, zinv2)
    y = F.mul(Y, zinv3)
    x = F.select(inf, F.zeros(batch), x)
    y = F.select(inf, F.zeros(batch), y)
    return x, y, inf


def scalar_mul_bits(F, base_affine, bits, base_inf=None):
    """Batched double-and-add over LE bit arrays (n_bits, *batch)."""
    import jax

    batch = F.batch_shape(base_affine[0])

    def step(carry, bit):
        acc, cur = carry
        cand = add(F, acc, cur)
        acc = select(F, bit.astype(bool), cand, acc)
        cur = double(F, cur)
        return (acc, cur), None

    cur0 = (base_affine[0], base_affine[1], F.ones(batch))
    if base_inf is not None:
        cur0 = select(F, base_inf, identity(F, batch), cur0)
    init = (identity(F, batch), cur0)
    (acc, _), _ = jax.lax.scan(step, init, bits)
    return acc


def scalar_mul_bits_jac(F, base_jac, bits):
    """Batched double-and-add from a JACOBIAN base point batch."""
    import jax

    batch = F.batch_shape(base_jac[0])

    def step(carry, bit):
        acc, cur = carry
        cand = add(F, acc, cur)
        acc = select(F, bit.astype(bool), cand, acc)
        cur = double(F, cur)
        return (acc, cur), None

    init = (identity(F, batch), base_jac)
    (acc, _), _ = jax.lax.scan(step, init, bits)
    return acc
