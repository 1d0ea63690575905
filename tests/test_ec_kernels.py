"""Batched curve kernels vs the mirror oracle (CPU backend, tiny batches)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zerochain_tpu.ec import g1 as jg1
from zerochain_tpu.ec import g2 as jg2
from zerochain_tpu.ec import jubjub as jjj
from zerochain_tpu.mirror import curves as cv
from zerochain_tpu.mirror import jubjub as mjj
from zerochain_tpu.mirror.field import R, S


def _bits_le(v, n):
    return [(v >> i) & 1 for i in range(n)]


# --------------------------------------------------------------- jubjub
@pytest.fixture(scope="module")
def jj_points():
    g = mjj.generator()
    pts = [mjj.mul(g, 3 + 7 * i) for i in range(8)]
    return pts


def test_jubjub_add_double_vs_mirror(jj_points):
    p = jjj.to_extended(jj_points)
    s = jjj.add(p, p)
    d = jjj.double(p)
    exp = [mjj.double(q) for q in jj_points]
    assert jjj.to_affine_host(s) == exp
    assert jjj.to_affine_host(d) == exp


def test_jubjub_mixed_adds(jj_points):
    a = jjj.to_extended(jj_points)
    b = jjj.to_extended(list(reversed(jj_points)))
    out = jjj.to_affine_host(jjj.add(a, b))
    exp = [mjj.add(p, q) for p, q in zip(jj_points, reversed(jj_points))]
    assert out == exp


def test_jubjub_identity_cases(jj_points):
    p = jjj.to_extended(jj_points[:2])
    idt = jjj.identity((2,))
    assert jjj.to_affine_host(jjj.add(p, idt)) == jj_points[:2]
    assert jjj.to_affine_host(jjj.add(idt, p)) == jj_points[:2]
    # p + (-p) = identity
    out = jjj.to_affine_host(jjj.add(p, jjj.neg(p)))
    assert out == [mjj.ZERO, mjj.ZERO]


def test_jubjub_scalar_mul(jj_points):
    scalars = [5, 123456789, S - 1, 0]
    base = jjj.to_extended(jj_points[:4])
    bits = jnp.asarray(
        np.array([_bits_le(s, 252) for s in scalars]).T, dtype=jnp.int32
    )
    out = jjj.to_affine_host(jjj.scalar_mul_bits(base, bits))
    exp = [mjj.mul(p, s) for p, s in zip(jj_points[:4], scalars)]
    assert out == exp


# ------------------------------------------------------------------- g1
@pytest.fixture(scope="module")
def g1_points():
    return [cv.g1_mul(cv.G1_GEN, 11 + 5 * i) for i in range(6)]


def test_g1_add_double_vs_mirror(g1_points):
    p = jg1.from_affine_host(g1_points)
    dbl = jg1.to_affine_host(jg1.double(p))
    assert dbl == [cv.g1_double(q) for q in g1_points]
    ssum = jg1.to_affine_host(jg1.add(p, p))  # degenerate: P == P
    assert ssum == dbl


def test_g1_add_cases(g1_points):
    a = jg1.from_affine_host(g1_points)
    b = jg1.from_affine_host(list(reversed(g1_points)))
    out = jg1.to_affine_host(jg1.add(a, b))
    exp = [cv.g1_add(p, q) for p, q in zip(g1_points, reversed(g1_points))]
    assert out == exp
    # P + (-P) -> infinity; P + inf -> P
    negb = jg1.neg(a)
    out2 = jg1.to_affine_host(jg1.add(a, negb))
    assert out2 == [None] * len(g1_points)
    idt = jg1.identity((len(g1_points),))
    assert jg1.to_affine_host(jg1.add(a, idt)) == g1_points
    assert jg1.to_affine_host(jg1.add(idt, a)) == g1_points


def test_g1_mixed_add(g1_points):
    a = jg1.from_affine_host(g1_points)
    q = g1_points[0]
    qa = (
        jg1.F.from_ints([q[0]] * 6),
        jg1.F.from_ints([q[1]] * 6),
    )
    out = jg1.to_affine_host(jg1.add_mixed(a, qa))
    assert out == [cv.g1_add(p, q) for p in g1_points]


def test_g1_scalar_mul(g1_points):
    scalars = [1, 2, 0xDEADBEEF, R - 1, 0, 7]
    base = (
        jg1.F.from_ints([p[0] for p in g1_points]),
        jg1.F.from_ints([p[1] for p in g1_points]),
    )
    bits = jnp.asarray(
        np.array([_bits_le(s, 255) for s in scalars]).T, dtype=jnp.int32
    )
    out = jg1.to_affine_host(jg1.scalar_mul_bits(base, bits))
    assert out == [cv.g1_mul(p, s) for p, s in zip(g1_points, scalars)]


# ------------------------------------------------------------------- g2
def test_g2_ops_vs_mirror():
    pts = [cv.g2_mul(cv.G2_GEN, 3 + i) for i in range(4)]
    p = jg2.from_affine_host(pts)
    assert jg2.to_affine_host(jg2.double(p)) == [cv.g2_double(q) for q in pts]
    b = jg2.from_affine_host(list(reversed(pts)))
    out = jg2.to_affine_host(jg2.add(p, b))
    assert out == [cv.g2_add(x, y) for x, y in zip(pts, reversed(pts))]
    scalars = [5, 9, 1, R - 2]
    base = (
        jg2.F.from_ints([q[0] for q in pts]),
        jg2.F.from_ints([q[1] for q in pts]),
    )
    bits = jnp.asarray(
        np.array([_bits_le(s, 255) for s in scalars]).T, dtype=jnp.int32
    )
    out = jg2.to_affine_host(jg2.scalar_mul_bits(base, bits))
    assert out == [cv.g2_mul(q, s) for q, s in zip(pts, scalars)]
