"""JAX limb field kernels vs the bigint mirror (exactness oracle)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zerochain_tpu.ff import limbs as L
from zerochain_tpu.mirror import field as mf

SPECS = [L.FQ, L.FR, L.FS]


def O(spec):
    return L.ops(spec)


def rand_elems(spec, k, seed=0):
    rng = random.Random(seed + spec.n)
    return [rng.randrange(spec.p) for _ in range(k)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_roundtrip_conversion(spec):
    vals = rand_elems(spec, 16, seed=1)
    arr = L.to_limbs(spec, vals)
    assert arr.shape == (spec.n, 16)
    assert L.from_limbs(spec, arr) == vals
    arr_m = L.to_limbs(spec, vals, mont=True)
    assert L.from_limbs(spec, arr_m, mont=True) == vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    vals_a = rand_elems(spec, 64, seed=2)
    vals_b = rand_elems(spec, 64, seed=3)
    # include edge cases
    vals_a[:3] = [0, spec.p - 1, 1]
    vals_b[:3] = [0, spec.p - 1, spec.p - 1]
    a = L.to_limbs(spec, vals_a)
    b = L.to_limbs(spec, vals_b)
    got_add = L.from_limbs(spec, O(spec).add(a, b))
    got_sub = L.from_limbs(spec, O(spec).sub(a, b))
    got_neg = L.from_limbs(spec, O(spec).neg(a))
    for i, (x, y) in enumerate(zip(vals_a, vals_b)):
        assert got_add[i] == (x + y) % spec.p
        assert got_sub[i] == (x - y) % spec.p
        assert got_neg[i] == (-x) % spec.p


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_mul_matches_bigint(spec):
    vals_a = rand_elems(spec, 64, seed=4)
    vals_b = rand_elems(spec, 64, seed=5)
    vals_a[:4] = [0, 1, spec.p - 1, spec.r_mod_p]
    vals_b[:4] = [0, spec.p - 1, spec.p - 1, 1]
    a = L.to_limbs(spec, vals_a, mont=True)
    b = L.to_limbs(spec, vals_b, mont=True)
    got = L.from_limbs(
        spec, O(spec).mul(a, b), mont=True
    )
    for i, (x, y) in enumerate(zip(vals_a, vals_b)):
        assert got[i] == x * y % spec.p, f"mismatch at {i}"


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_to_from_mont(spec):
    vals = rand_elems(spec, 16, seed=6)
    a = L.to_limbs(spec, vals)
    m = O(spec).to_mont(a)
    assert L.from_limbs(spec, m, mont=True) == vals
    back = O(spec).from_mont(m)
    assert L.from_limbs(spec, back) == vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_inverse(spec):
    vals = rand_elems(spec, 8, seed=7)
    a = L.to_limbs(spec, vals, mont=True)
    inv = O(spec).inv(a)
    got = L.from_limbs(spec, inv, mont=True)
    for i, v in enumerate(vals):
        assert got[i] == pow(v, spec.p - 2, spec.p)


@pytest.mark.parametrize("spec", [L.FQ, L.FR], ids=lambda s: s.name)
def test_batch_inverse(spec):
    vals = rand_elems(spec, 33, seed=8)
    vals[5] = 0  # zero entries must map to zero
    a = L.to_limbs(spec, vals, mont=True)
    inv = O(spec).batch_inv(a)
    got = L.from_limbs(spec, inv, mont=True)
    for i, v in enumerate(vals):
        expect = 0 if v == 0 else pow(v, spec.p - 2, spec.p)
        assert got[i] == expect, f"mismatch at {i}"


def test_pow_fixed_fr_root_of_unity():
    # 7^FR_T must equal the 2^32 root of unity (fr.rs:50)
    a = L.to_limbs(L.FR, [7], mont=True)
    got = L.from_limbs(
        L.FR, L.pow_fixed(L.FR, a, mf.FR_T), mont=True
    )
    assert got[0] == mf.FR_ROOT_OF_UNITY


def test_predicates_and_select():
    vals = [0, 1, 5, 0]
    a = L.to_limbs(L.FR, vals)
    assert list(np.asarray(L.is_zero(a))) == [True, False, False, True]
    b = L.to_limbs(L.FR, [9, 9, 5, 9])
    assert list(np.asarray(L.eq(a, b))) == [False, False, True, False]
    sel = L.select(jnp.asarray([True, False, True, False]), a, b)
    assert L.from_limbs(L.FR, sel) == [0, 9, 5, 9]


def test_multidim_batch():
    spec = L.FR
    vals = rand_elems(spec, 12, seed=9)
    a = L.to_limbs(spec, vals, mont=True).reshape(spec.n, 3, 4)
    b = L.to_limbs(spec, vals[::-1], mont=True).reshape(spec.n, 3, 4)
    out = O(spec).mul(a, b)
    got = L.from_limbs(spec, out.reshape(spec.n, 12), mont=True)
    for i in range(12):
        assert got[i] == vals[i] * vals[11 - i] % spec.p
