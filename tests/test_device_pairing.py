"""Device (jnp) pairing vs the host mirror oracle and the RELIC vector.

The mirror pairing is itself pinned to the reference's RELIC golden vector
(core/pairing/src/bls12_381/tests/mod.rs:4-60, tests/test_mirror_pairing.py);
here the lax.scan Miller loop + final exponentiation must reproduce it
bit-for-bit, plus bilinearity e(aP, bQ) == e(abP, Q).
"""

from zerochain_tpu.ec import pairing as DP
from zerochain_tpu.mirror import curves as C
from zerochain_tpu.mirror import pairing as P
from tests.test_mirror_pairing import RELIC


def test_device_pairing_relic():
    assert DP.pairing_host(C.G1_GEN, C.G2_GEN) == RELIC


def test_device_pairing_bilinearity():
    a, b = 0x1234567, 0x89ABCDE
    pa = C.g1_mul(C.G1_GEN, a)
    qb = C.g2_mul(C.G2_GEN, b)
    pab = C.g1_mul(C.G1_GEN, a * b)
    assert DP.pairing_host(pa, qb) == DP.pairing_host(pab, C.G2_GEN)
    # cross-check against the host mirror on a non-generator pair
    assert DP.pairing_host(pa, qb) == P.pairing(pa, qb)
