"""Suffix-sum MSM (msm/suffix.py) vs the host mirror.

Covers: G1 batch with infinities, chunked window_partials + one combine
(the prover's usage), G2, digit extraction straight from 12-bit limbs vs
the round-2 bit-expansion path, and the Ladner-Fischer prefix scan.
Widths are kept tiny: the kernels are width-generic and the CPU backend's
compile cost scales with window count.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zerochain_tpu.ec import g1 as jg1
from zerochain_tpu.ec import g2 as jg2
from zerochain_tpu.ec import weierstrass as W
from zerochain_tpu.ec.fields import FqOps, Fq2Ops
from zerochain_tpu.ff import limbs as L
from zerochain_tpu.mirror import curves as cv
from zerochain_tpu.msm.pippenger import limbs_to_bits, digits_from_bits, tmap
from zerochain_tpu.msm.suffix import SuffixMsm, digits_from_limbs, lf_scan


def _limbs(scalars_per_proof):
    """list (per proof) of scalar lists -> (n_limbs, N, B) canonical."""
    return jnp.asarray(
        np.stack(
            [
                np.stack([L._int_to_limbs(v, L.FR.n) for v in s], 1)
                for s in scalars_per_proof
            ],
            -1,
        )
    )


def test_digits_from_limbs_matches_bits():
    rng = np.random.RandomState(7)
    scal = [[int.from_bytes(rng.bytes(31), "little") for _ in range(6)]]
    arrs = _limbs(scal)
    for c in (4, 8, 12):
        nw = -(-255 // c)
        d1 = digits_from_limbs(arrs, c, nw)
        d2 = digits_from_bits(limbs_to_bits(arrs, 255), c, nw)
        assert np.array_equal(np.asarray(d1), np.asarray(d2)), c


def test_lf_scan_is_prefix_sum():
    rng = np.random.RandomState(3)
    N = 8
    pts_host = [cv.g1_mul(cv.G1_GEN, 2 + int(rng.randint(1, 99)))
                for _ in range(N)]
    pts_host[2] = None
    pts = jg1.from_affine_host(pts_host)
    pre = jax.jit(lambda p: lf_scan(FqOps, p))(pts)
    got = jg1.to_affine_host(pre)
    acc = None
    for i in range(N):
        acc = cv.g1_add(acc, pts_host[i])
        assert got[i] == acc, i


def test_suffix_msm_g1_batch():
    rng = np.random.RandomState(0)
    N, B = 16, 2
    pts_host = [cv.g1_mul(cv.G1_GEN, 3 + 7 * i) for i in range(N)]
    pts_host[5] = None
    scal = [
        [int(rng.randint(0, 1 << 30)) * (b + 1) + b for _ in range(N)]
        for b in range(B)
    ]
    scal[1][3] = 0  # zero scalar
    exp = [cv.g1_msm(pts_host, s) for s in scal]

    pts = jg1.from_affine_host(pts_host)
    m = SuffixMsm(FqOps, c=4, n_bits=32, window_group=4)
    digits = digits_from_limbs(_limbs(scal), 4, m.n_windows)
    got = jg1.to_affine_host(m(pts, digits))
    assert got == exp


def test_suffix_msm_g1_chunked_partials():
    rng = np.random.RandomState(1)
    N = 16
    pts_host = [cv.g1_mul(cv.G1_GEN, 11 + 5 * i) for i in range(N)]
    scal = [[int(rng.randint(1, 1 << 30)) for _ in range(N)]]
    exp = cv.g1_msm(pts_host, scal[0])

    pts = jg1.from_affine_host(pts_host)
    m = SuffixMsm(FqOps, c=4, n_bits=32, window_group=8)
    digits = digits_from_limbs(_limbs(scal), 4, m.n_windows)
    acc = None
    for off in (0, 8):
        cp = tmap(lambda a: a[..., off : off + 8], pts)
        part = m.window_partials(cp, digits[:, off : off + 8])
        acc = part if acc is None else W.add(FqOps, acc, part)
    got = jg1.to_affine_host(m.combine(acc))
    assert got == [exp]


def test_suffix_msm_g2():
    # minimal widths: Fq2 graphs compile slowly on XLA:CPU; a single
    # 4-bit window still covers the whole sort/scan/gather path over Fq2
    rng = np.random.RandomState(2)
    N = 4
    pts_host = [cv.g2_mul(cv.G2_GEN, 5 + 3 * i) for i in range(N)]
    pts_host[3] = None
    scal = [[int(rng.randint(1, 1 << 4)) for _ in range(N)]]
    exp = cv.g2_msm(pts_host, scal[0])

    pts = jg2.from_affine_host(pts_host)
    m = SuffixMsm(Fq2Ops, c=4, n_bits=4, window_group=1)
    digits = digits_from_limbs(_limbs(scal), 4, m.n_windows)
    got = jg2.to_affine_host(m(pts, digits))
    assert got == [exp]


def test_signed_digits_reconstruct():
    """Signed digit decomposition must satisfy sum d_w * 2^(c*w) = s,
    with |d_w| <= 2^(c-1)."""
    from zerochain_tpu.msm.suffix import signed_digits_from_limbs

    rng = np.random.RandomState(11)
    scal = [[int.from_bytes(rng.bytes(31), "little") for _ in range(5)]]
    arrs = _limbs(scal)
    for c in (4, 8):
        nw = 255 // c + 1 if 255 % c == 0 else -(-255 // c)
        if c * nw <= 255:
            nw += 1
        d = np.asarray(signed_digits_from_limbs(arrs, c, nw))
        assert np.abs(d).max() <= 1 << (c - 1)
        for i, s in enumerate(scal[0]):
            got = sum(int(d[w, i, 0]) << (c * w) for w in range(nw))
            assert got == s, (c, i)


def test_suffix_msm_signed_g1():
    """Signed-digit mode (the prover's encoding): halved bucket range,
    sign applied by Y negation — must match the host mirror exactly."""
    rng = np.random.RandomState(4)
    N, B = 16, 2
    pts_host = [cv.g1_mul(cv.G1_GEN, 3 + 7 * i) for i in range(N)]
    pts_host[2] = None
    scal = [
        [int(rng.randint(0, 1 << 30)) for _ in range(N)] for _ in range(B)
    ]
    scal[0][5] = 0
    exp = [cv.g1_msm(pts_host, s) for s in scal]

    pts = jg1.from_affine_host(pts_host)
    m = SuffixMsm(FqOps, c=4, n_bits=31, window_group=4, signed=True)
    digits = m.digits(_limbs(scal))
    got = jg1.to_affine_host(m(pts, digits))
    assert got == exp


def test_suffix_msm_signed_g2():
    rng = np.random.RandomState(5)
    N = 4
    pts_host = [cv.g2_mul(cv.G2_GEN, 5 + 3 * i) for i in range(N)]
    scal = [[int(rng.randint(1, 1 << 7)) for _ in range(N)]]
    exp = cv.g2_msm(pts_host, scal[0])

    pts = jg2.from_affine_host(pts_host)
    m = SuffixMsm(Fq2Ops, c=4, n_bits=7, window_group=1, signed=True)
    got = jg2.to_affine_host(m(pts, m.digits(_limbs(scal))))
    assert got == [exp]


def test_suffix_msm_shared_prep():
    """prep() hoisted out and passed to window_partials must equal the
    digits path — this is the pipeline's shared B1/B2 sort."""
    rng = np.random.RandomState(6)
    N = 8
    pts_host = [cv.g1_mul(cv.G1_GEN, 9 + 2 * i) for i in range(N)]
    pts = jg1.from_affine_host(pts_host)
    scal = [[int(rng.randint(1, 1 << 30)) for _ in range(N)]]
    m = SuffixMsm(FqOps, c=4, n_bits=31, window_group=4, signed=True)
    digits = m.digits(_limbs(scal))
    via_digits = m.window_partials(pts, digits)
    via_prep = m.window_partials(pts, prep=m.prep(digits))
    for a, b in zip(
        jax.tree_util.tree_leaves(via_digits),
        jax.tree_util.tree_leaves(via_prep),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    got = jg1.to_affine_host(m.combine(via_prep))
    assert got == [cv.g1_msm(pts_host, scal[0])]
