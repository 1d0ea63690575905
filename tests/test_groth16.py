"""Groth16 end-to-end (mirror backend, small circuits) + fixture parity.

The reference fixtures parsed here were produced by the Rust stack:
  - tests/vectors/conf_vk.dat / anony_vk.dat / test_conf_vk.dat /
    test_anony_vk.dat: PreparedVerifyingKey (zface/params)
  - tests/vectors/verification.params: PVK round-tripped by both reference
    stacks (core/bellman-verifier/src/tests/)
"""

import pytest

from zerochain_tpu.groth16 import (
    Proof,
    create_proof,
    generate_parameters,
    prepare_verifying_key,
    verify_proof,
)
from zerochain_tpu.groth16 import serialization as ser
from zerochain_tpu.groth16.core import synthesize_witness
from zerochain_tpu.mirror import curves as cv
from zerochain_tpu.mirror import pairing as pr
from zerochain_tpu.mirror.field import R


class MulCircuit:
    """Toy: prove knowledge of x, y with x*y = z (z public), plus a
    squaring chain to exercise the domain: x^2 = x2, x2^2 = x4."""

    def __init__(self, x=None, y=None):
        self.x = x
        self.y = y

    def synthesize(self, cs):
        x = cs.alloc("x", self.x)
        y = cs.alloc("y", self.y)
        z = cs.alloc_input(
            "z", None if self.x is None else self.x * self.y % R
        )
        cs.enforce("mult", [(x, 1)], [(y, 1)], [(z, 1)])
        x2 = cs.alloc(
            "x2", None if self.x is None else self.x * self.x % R
        )
        cs.enforce("sq1", [(x, 1)], [(x, 1)], [(x2, 1)])
        x4 = cs.alloc_input(
            "x4", None if self.x is None else pow(self.x, 4, R)
        )
        cs.enforce("sq2", [(x2, 1)], [(x2, 1)], [(x4, 1)])


TAU, ALPHA, BETA, GAMMA, DELTA = 7718, 48541, 1563, 8949, 12451


@pytest.fixture(scope="module")
def toy_params():
    return generate_parameters(MulCircuit(), TAU, ALPHA, BETA, GAMMA, DELTA)


@pytest.fixture(scope="module")
def toy_proof(toy_params):
    return create_proof(MulCircuit(x=6, y=7), toy_params, r=333, s=444)


def test_prove_verify_roundtrip(toy_params, toy_proof):
    pvk = prepare_verifying_key(toy_params.vk)
    assert verify_proof(pvk, toy_proof, [42, 1296])
    assert not verify_proof(pvk, toy_proof, [43, 1296])
    assert not verify_proof(pvk, toy_proof, [42, 1295])


def test_proof_vs_manual_groth16_equation(toy_params, toy_proof):
    """e(A,B) == e(alpha,beta) * e(IC(x), gamma) * e(C, delta)."""
    vk = toy_params.vk
    acc = vk.ic[0]
    for x, b in zip([42, 1296], vk.ic[1:]):
        acc = cv.g1_add(acc, cv.g1_mul(b, x))
    lhs = pr.pairing(toy_proof.a, toy_proof.b)
    rhs = pr.final_exponentiation(
        pr.miller_loop(
            [
                (vk.alpha_g1, vk.beta_g2),
                (acc, vk.gamma_g2),
                (toy_proof.c, vk.delta_g2),
            ]
        )
    )
    assert lhs == rhs


def test_proof_serialization_roundtrip(toy_proof):
    b = ser.proof_to_bytes(toy_proof)
    assert len(b) == 192
    p2 = ser.proof_from_bytes(b)
    assert p2 == toy_proof
    # single bit flip must not decode to the same proof / must fail verify
    bad = bytearray(b)
    bad[1] ^= 1
    try:
        p3 = ser.proof_from_bytes(bytes(bad))
        assert p3 != toy_proof
    except cv.DecodeError:
        pass


def test_pvk_serialization_roundtrip(toy_params):
    pvk = prepare_verifying_key(toy_params.vk)
    b = ser.pvk_to_bytes(pvk)
    pvk2 = ser.pvk_from_bytes(b)
    assert pvk2.alpha_g1_beta_g2 == pvk.alpha_g1_beta_g2
    assert pvk2.neg_gamma_g2 == pvk.neg_gamma_g2
    assert pvk2.neg_delta_g2 == pvk.neg_delta_g2
    assert pvk2.ic == pvk.ic
    assert ser.pvk_to_bytes(pvk2)[:576] == b[:576]


def test_vk_and_params_serialization(toy_params):
    vkb = ser.vk_to_bytes(toy_params.vk)
    vk2 = ser.vk_from_bytes(vkb)
    assert vk2 == toy_params.vk

    pb = ser.params_to_bytes(toy_params)
    dens = ser.densities_for(MulCircuit())
    p2 = ser.params_from_bytes(pb, dens, toy_params.num_inputs)
    assert p2.vk == toy_params.vk
    assert p2.h == toy_params.h
    assert p2.l == toy_params.l
    assert p2.a == toy_params.a
    assert p2.b_g1 == toy_params.b_g1
    assert p2.b_g2 == toy_params.b_g2
    # proving with the deserialized params yields the identical proof
    proof2 = create_proof(MulCircuit(x=6, y=7), p2, r=333, s=444)
    assert proof2 == create_proof(MulCircuit(x=6, y=7), toy_params, r=333, s=444)


@pytest.mark.parametrize(
    "name,n_ic",
    [
        ("conf_vk.dat", 23),
        ("test_conf_vk.dat", 23),
        ("anony_vk.dat", 105),
        ("test_anony_vk.dat", 105),
        ("verification.params", 17),  # bellman-verifier's own test circuit
    ],
)
def test_reference_pvk_fixtures_parse(vectors_dir, name, n_ic):
    """Reference-produced PVKs parse, have the documented IC sizes, valid
    points, and re-serialize byte-identically."""
    raw = (vectors_dir / name).read_bytes()
    pvk = ser.pvk_from_bytes(raw)
    assert len(pvk.ic) == n_ic
    assert len(pvk.neg_gamma_g2) == 68  # 63 doublings + 5 additions
    assert len(pvk.neg_delta_g2) == 68
    for p in pvk.ic[:3]:
        assert cv.g1_is_on_curve(p)
    assert ser.pvk_to_bytes(pvk) == raw


def test_wrong_witness_rejected(toy_params):
    # sanity: a valid witness synthesizes fine
    synthesize_witness(MulCircuit(x=6, y=7))

    # inconsistent witness: claims z=43 while x*y=42
    class Bad(MulCircuit):
        def synthesize(self, cs):
            x = cs.alloc("x", 6)
            y = cs.alloc("y", 7)
            z = cs.alloc_input("z", 43)
            cs.enforce("mult", [(x, 1)], [(y, 1)], [(z, 1)])

    with pytest.raises(AssertionError):
        create_proof(Bad(), toy_params, 1, 2)
