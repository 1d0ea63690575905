"""MSM kernels vs the mirror oracle."""

import numpy as np
import pytest

from zerochain_tpu.ec import g1 as jg1
from zerochain_tpu.ec import g2 as jg2
from zerochain_tpu.ec.fields import FqOps, Fq2Ops
from zerochain_tpu.msm import pippenger as pip
from zerochain_tpu.mirror import curves as cv
from zerochain_tpu.mirror.field import R

rng = np.random.default_rng(11)


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """XLA:CPU deterministically segfaults SERIALIZING this module's big
    MSM executables to the persistent cache (jax compilation_cache
    put_executable_and_time, reproduced twice at the same test) — skip
    cache writes for this module; the compact-carry graphs recompile in
    a couple of minutes.

    NB: changing jax_compilation_cache_dir here is NOT enough — jax's
    cache object is a global initialized once, so a later dir change is
    ignored (reproduced: the round-2 dir=None version still crashed in
    put_executable_and_time).  The write gate that IS consulted on every
    compile is persistent_cache_min_compile_time_secs; raise it so no
    executable from this module is ever serialized.  Cache READS keep
    working either way."""
    import jax

    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)


def _rand_scalars(n):
    return [int.from_bytes(rng.bytes(32), "little") % R for _ in range(n)]


@pytest.fixture(scope="module")
def g1_points():
    # pseudo-random distinct points (cheap to build: multiples of G)
    ks = [3 + 17 * i for i in range(300)]
    base = cv.G1_GEN
    pts, cur = [], base
    for k in range(300):
        pts.append(cur)
        cur = cv.g1_add(cur, cv.g1_double(pts[-1]))
    return pts


def test_small_naive_msm_g1(g1_points):
    pts = g1_points[:10]
    scalars = _rand_scalars(10)
    out = pip.msm_g1(pts, scalars)
    assert out == cv.g1_msm(pts, scalars)


def test_pippenger_msm_g1(g1_points):
    pts = g1_points[:150]
    scalars = _rand_scalars(150)
    scalars[3] = 0  # zero scalar skipped
    out = pip.msm_g1(pts, [s for s in scalars])
    assert out == cv.g1_msm(pts, scalars)


def test_pippenger_with_infinities_and_duplicates(g1_points):
    pts = list(g1_points[:100])
    pts[5] = None
    pts[6] = pts[7]  # duplicate points stress degenerate add cases
    scalars = _rand_scalars(100)
    scalars[8] = 1
    scalars[9] = R - 1
    out = pip.msm_g1(pts, scalars)
    exp = cv.g1_msm([p for p in pts if p is not None],
                    [s for p, s in zip(pts, scalars) if p is not None])
    assert out == exp


def test_msm_g2():
    pts = [cv.g2_mul(cv.G2_GEN, 3 + i) for i in range(70)]
    scalars = _rand_scalars(70)
    out = pip.msm_g2(pts, scalars)
    assert out == cv.g2_msm(pts, scalars)


def test_fixed_base_msm_g1():
    scalars = _rand_scalars(50) + [0, 1, 2, R - 1]
    fb = pip.FixedBaseMsm(FqOps, cv.G1_GEN)
    bits = pip.scalars_to_bits(scalars, 255)
    res = fb(bits)
    out = jg1.to_affine_host(res)
    exp = [cv.g1_mul(cv.G1_GEN, s) for s in scalars]
    assert out == exp


def test_limbs_to_bits_roundtrip():
    from zerochain_tpu.ff import limbs as L

    vals = _rand_scalars(9)
    arr = L.to_limbs(L.FR, vals)  # canonical
    bits = pip.limbs_to_bits(arr, 255)
    got = np.asarray(bits)
    for j, v in enumerate(vals):
        for i in range(255):
            assert got[i, j] == (v >> i) & 1
