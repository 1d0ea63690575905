"""JAX NTT vs the Python-domain oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from zerochain_tpu.ff import limbs as L
from zerochain_tpu.groth16 import domain as dom
from zerochain_tpu.mirror.field import R
from zerochain_tpu.ntt import plan_for

FR = L.FR
rng = np.random.default_rng(7)


def _rand_fr(n):
    return [int.from_bytes(rng.bytes(32), "little") % R for _ in range(n)]


def _dev(vals):
    return L.to_limbs(FR, vals, mont=True)


def _host(arr):
    return L.from_limbs(FR, arr, mont=True)


@pytest.mark.parametrize("d", [8, 64, 256])
def test_ntt_intt_vs_oracle(d):
    plan = plan_for(d)
    vals = _rand_fr(d)
    omega = dom.omega_for(d)

    out = _host(plan.ntt(_dev(vals)))
    assert out == dom.ntt(vals, omega)

    back = _host(plan.intt(_dev(out)))
    assert back == vals


@pytest.mark.parametrize("d", [16, 128])
def test_coset_and_z_division(d):
    plan = plan_for(d)
    vals = _rand_fr(d)
    omega = dom.omega_for(d)

    out = _host(plan.coset_ntt(_dev(vals)))
    assert out == dom.coset_fft(vals, omega)

    back = _host(plan.icoset_ntt(_dev(out)))
    assert back == vals

    zi = pow(dom.z_on_coset(d), R - 2, R)
    dv = _host(plan.divide_by_z_on_coset(_dev(vals)))
    assert dv == [v * zi % R for v in vals]


def test_batched_ntt():
    d, b = 32, 3
    plan = plan_for(d)
    omega = dom.omega_for(d)
    rows = [_rand_fr(d) for _ in range(b)]
    flat = [v for row in rows for v in row]
    arr = _dev(flat).reshape(FR.n, b, d)
    out = plan.ntt(arr)
    got = _host(out.reshape(FR.n, b * d))
    exp = [v for row in rows for v in dom.ntt(row, omega)]
    assert got == exp


def test_quotient_identity():
    """(a*b - c)/z on coset == polynomial division result: pick
    c = a*b pointwise on the domain so quotient h satisfies
    a(x)b(x) - c(x) = h(x) z(x) with h recovered exactly."""
    d = 64
    plan = plan_for(d)
    omega = dom.omega_for(d)
    a_vals = _rand_fr(d)
    b_vals = _rand_fr(d)
    c_vals = [a * b % R for a, b in zip(a_vals, b_vals)]

    a_c = plan.coset_ntt(plan.intt(_dev(a_vals)))
    b_c = plan.coset_ntt(plan.intt(_dev(b_vals)))
    c_c = plan.coset_ntt(plan.intt(_dev(c_vals)))

    prod = L.mont_mul(FR, a_c, b_c)
    diff = L.sub(FR, prod, c_c)
    q = plan.divide_by_z_on_coset(diff)
    h = _host(plan.icoset_ntt(q))

    # oracle
    ac = dom.coset_fft(dom.intt(a_vals, omega), omega)
    bc = dom.coset_fft(dom.intt(b_vals, omega), omega)
    cc = dom.coset_fft(dom.intt(c_vals, omega), omega)
    zinv = pow(dom.z_on_coset(d), R - 2, R)
    qq = [(x * y - z) % R * zinv % R for x, y, z in zip(ac, bc, cc)]
    exp = dom.icoset_fft(qq, omega)
    assert h == exp
    # degree < d-1: top coefficient vanishes
    assert exp[-1] == 0
