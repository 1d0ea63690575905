"""Column-major pallas scan (msm/pallas_scan.py) in interpret mode.

The kernel normally needs a real TPU (Mosaic lowering); interpret mode
runs the kernel body as plain jax ops on CPU, so the DEFAULT suite can
check the depth-scan semantics and the logical<->physical index maps.
The fused-add formula itself is covered bit-exactly by test_ec_kernels.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zerochain_tpu.ec import g1 as jg1
from zerochain_tpu.ec import weierstrass as W
from zerochain_tpu.ec.fields import FqOps
from zerochain_tpu.ff import limbs as L
from zerochain_tpu.ff import pallas_ff as PF
from zerochain_tpu.mirror import curves as cv
from zerochain_tpu.msm import pallas_scan as PS


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(PF, "INTERPRET", True)
    PS._column_scan_kernel.cache_clear()
    yield
    PS._column_scan_kernel.cache_clear()


def test_phys_perm_roundtrip():
    n = 4096
    perm = np.asarray(PS.phys_perm(n))
    # p[j] = logical index stored at physical j; inverse is logical_to_phys
    j = np.arange(n)
    assert np.array_equal(
        np.asarray(PS.logical_to_phys(jnp.asarray(perm[j]), n)), j
    )
    assert sorted(perm.tolist()) == list(range(n))


@pytest.mark.skipif(
    not os.environ.get("ZEROCHAIN_PALLAS_TESTS"),
    reason="interpret-mode compile of the 96-plane kernel takes >20 min "
    "on XLA:CPU; run explicitly with ZEROCHAIN_PALLAS_TESTS=1 (the TPU "
    "path is exercised end-to-end by bench.py's Groth16 verification "
    "gate every round)",
)
def test_column_scan_depth_prefixes(interpret_kernels):
    """T=2 depth scan: physical (t=1, vl) must hold logical pair sums."""
    n = 2048  # T = 2
    t_depth = n // PS.VL
    pts_aff = [cv.g1_mul(cv.G1_GEN, 3 + i) for i in range(8)]
    base = jg1.from_affine_host(pts_aff)
    pts = jax.tree.map(
        lambda a: jnp.tile(a, (1,) * (a.ndim - 1) + (n // 8,)), base
    )
    # place points in column-major order: physical j holds logical i(j)
    perm = PS.phys_perm(n)
    pts_cm = jax.tree.map(lambda a: jnp.take(a, perm, axis=-1), pts)

    pre = PS.column_scan(FqOps, pts_cm)

    # logical element i is pts_aff[(i*...) % 8] tiled: logical i -> affine
    def logical_aff(i):
        return pts_aff[i % 8]

    x, y, inf = W.normalize(FqOps, pre)
    x = np.asarray(x)
    y = np.asarray(y)
    for vl in (0, 1, 130, 1023):
        for t in range(t_depth):
            j = t * PS.VL + vl
            expect = None
            for tt in range(t + 1):
                expect = cv.g1_add(expect, logical_aff(vl * t_depth + tt))
            got = (
                L.from_limbs(L.FQ, x[:, j : j + 1], mont=True)[0],
                L.from_limbs(L.FQ, y[:, j : j + 1], mont=True)[0],
            )
            assert got == expect, (vl, t)


def test_scan_reduce_and_exclusive_scan_cpu():
    """The single-instance reduce/exclusive-scan forms used by the MSM
    tail, on the composed CPU path, vs naive group sums."""
    from zerochain_tpu.msm.suffix import (
        exclusive_scan_last, scan_reduce_last,
    )

    k = 6
    pts_aff = [cv.g1_mul(cv.G1_GEN, 2 + i) for i in range(k)]
    pts = jg1.from_affine_host(pts_aff)

    tot = scan_reduce_last(FqOps, pts, k)
    tx, ty, _ = W.normalize(FqOps, tot)
    expect = None
    for p in pts_aff:
        expect = cv.g1_add(expect, p)
    got = (
        L.from_limbs(L.FQ, np.asarray(tx).reshape(L.FQ.n, 1), mont=True)[0],
        L.from_limbs(L.FQ, np.asarray(ty).reshape(L.FQ.n, 1), mont=True)[0],
    )
    assert got == expect

    ex = exclusive_scan_last(FqOps, pts)
    ex_x, ex_y, ex_inf = W.normalize(FqOps, ex)
    assert bool(np.asarray(ex_inf)[0])  # first = identity
    for i in (1, 3, k - 1):
        expect = None
        for p in pts_aff[:i]:
            expect = cv.g1_add(expect, p)
        got = (
            L.from_limbs(
                L.FQ, np.asarray(ex_x)[:, i : i + 1], mont=True
            )[0],
            L.from_limbs(
                L.FQ, np.asarray(ex_y)[:, i : i + 1], mont=True
            )[0],
        )
        assert got == expect, i


@pytest.mark.skipif(
    not os.environ.get("ZEROCHAIN_PALLAS_TESTS"),
    reason="interpret-mode compile of the totals kernel takes tens of "
    "minutes on XLA:CPU; run explicitly with ZEROCHAIN_PALLAS_TESTS=1 "
    "(the TPU path is exercised end-to-end by bench.py's Groth16 "
    "verification gate every round)",
)
@pytest.mark.parametrize("signed", [False, True])
def test_window_totals_vs_host(signed, monkeypatch):
    """The single-kernel suffix tail (counts, exclusive scan, one-hot
    gathers, reduce) vs a host-mirror MSM, interpret mode, T=2."""
    monkeypatch.setattr(PF, "INTERPRET", True)
    PS._totals_kernel.cache_clear()
    try:
        n = 2048  # T = 2
        rng = np.random.RandomState(8)
        pts_aff = [cv.g1_mul(cv.G1_GEN, 3 + i) for i in range(8)]
        base = jg1.from_affine_host(pts_aff)
        pts = jax.tree.map(
            lambda a: jnp.tile(a, (1,) * (a.ndim - 1) + (n // 8,)), base
        )
        if signed:
            digs = rng.randint(-128, 129, size=(1, n)).astype(np.int32)
            nb = 129
        else:
            digs = rng.randint(0, 256, size=(1, n)).astype(np.int32)
            nb = 256
        # mostly-zero digit skew like real witness scalars
        digs[0, : n // 2] = 0

        # host expectation
        from zerochain_tpu.mirror.field import R as _R

        exp = cv.g1_msm(
            [pts_aff[i % 8] for i in range(n)],
            [int(d) % _R for d in digs[0]],
        )

        # sort by |digit| descending, lay out column-major
        mags = np.abs(digs[0]) if signed else digs[0]
        order = np.argsort(-mags, kind="stable").astype(np.int32)
        perm = np.asarray(PS.phys_perm(n))
        phys_order = order[perm]
        sd_cm = jnp.asarray(digs[0][phys_order])[None, :]
        pts_cm = jax.tree.map(
            lambda a: jnp.take(a, jnp.asarray(phys_order), axis=-1)[
                :, None, :
            ],
            pts,
        )
        tot = PS.window_totals(FqOps, pts_cm, sd_cm, nb, signed=signed)
        got = jg1.to_affine_host(tot)
        assert got == [exp]
    finally:
        PS._totals_kernel.cache_clear()
