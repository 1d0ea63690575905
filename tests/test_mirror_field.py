"""Mirror field arithmetic vs the reference's published limb constants.

Expected values below are the u64 limb constants from
core/pairing/src/bls12_381/fq.rs, fr.rs and core/jubjub/src/curve/fs.rs —
used here as golden *data* to prove our derived constants match the
reference bit-exactly.
"""

import random

from zerochain_tpu.mirror import field as F


def limbs_to_int(limbs):
    v = 0
    for i, l in enumerate(limbs):
        v |= l << (64 * i)
    return v


def test_moduli_match_reference_limbs():
    # fq.rs:6, fr.rs:5, fs.rs:14
    assert F.Q == limbs_to_int(
        [0xB9FEFFFFFFFFAAAB, 0x1EABFFFEB153FFFF, 0x6730D2A0F6B0F624,
         0x64774B84F38512BF, 0x4B1BA7B6434BACD7, 0x1A0111EA397FE69A]
    )
    assert F.R == limbs_to_int(
        [0xFFFFFFFF00000001, 0x53BDA402FFFE5BFE,
         0x3339D80809A1D805, 0x73EDA753299D7D48]
    )
    assert F.S == limbs_to_int(
        [0xD0970E5ED6F72CB7, 0xA6682093CCC81082,
         0x06673B0101343B00, 0x0E7DB4EA6533AFA9]
    )


def test_montgomery_constants_match_reference():
    # R = 2^384 mod q (fq.rs:23); R2 (fq.rs:33); INV (fq.rs:43)
    assert pow(2, 384, F.Q) == limbs_to_int(
        [0x760900000002FFFD, 0xEBF4000BC40C0002, 0x5F48985753C758BA,
         0x77CE585370525745, 0x5C071A97A256EC6D, 0x15F65EC3FA80E493]
    )
    assert pow(2, 768, F.Q) == limbs_to_int(
        [0xF4DF1F341C341746, 0x0A76E6A609D104F1, 0x8DE5476C4C95B6D5,
         0x67EB88A9939D83C0, 0x9A793E85B519952D, 0x11988FE592CAE3AA]
    )
    assert (-pow(F.Q, -1, 1 << 64)) % (1 << 64) == 0x89F3FFFCFFFCFFFD
    # Fr R, R2, INV (fr.rs:20-36)
    assert pow(2, 256, F.R) == limbs_to_int(
        [0x00000001FFFFFFFE, 0x5884B7FA00034802,
         0x998C4FEFECBC4FF5, 0x1824B159ACC5056F]
    )
    assert (-pow(F.R, -1, 1 << 64)) % (1 << 64) == 0xFFFFFFFEFFFFFFFF
    # Fs INV (fs.rs:30)
    assert (-pow(F.S, -1, 1 << 64)) % (1 << 64) == 0x1BA3A358EF788EF9


def test_two_adicity_and_root_of_unity():
    # fr.rs:47-55: r - 1 = 2^32 * t, root of unity = 7^t
    assert (F.R - 1) % (1 << 32) == 0
    assert (F.R - 1) % (1 << 33) != 0
    root_mont = limbs_to_int(
        [0xB9B58D8C5F0E466A, 0x5B1B4C801819D7EC,
         0x0AF53AE352A31E64, 0x5BF3ADDA19E9B27B]
    )
    # reference stores the Montgomery form (x * 2^256 mod r)
    assert F.FR_ROOT_OF_UNITY == root_mont * pow(2, -256, F.R) % F.R
    assert pow(F.FR_ROOT_OF_UNITY, 1 << 32, F.R) == 1
    assert pow(F.FR_ROOT_OF_UNITY, 1 << 31, F.R) == F.R - 1


def test_generators_are_nonresidues():
    for gen, p in [(2, F.Q), (7, F.R), (6, F.S)]:
        assert F.legendre(gen, p) == -1


def test_field_laws():
    rng = random.Random(1234)
    for p, sqrt in [(F.Q, F.fq_sqrt), (F.R, F.fr_sqrt), (F.S, F.fs_sqrt)]:
        for _ in range(50):
            a = rng.randrange(p)
            b = rng.randrange(p)
            c = rng.randrange(p)
            assert (a + b) % p == (b + a) % p
            assert (a * b) % p * c % p == a * (b * c % p) % p
            assert a * ((b + c) % p) % p == (a * b + a * c) % p
            if a:
                assert a * pow(a, p - 2, p) % p == 1
            s = sqrt(a * a % p)
            assert s is not None and s * s % p == a * a % p


def test_fq2_tower_laws():
    rng = random.Random(99)

    def rand2():
        return (rng.randrange(F.Q), rng.randrange(F.Q))

    for _ in range(30):
        a, b, c = rand2(), rand2(), rand2()
        assert F.fq2_mul(a, b) == F.fq2_mul(b, a)
        assert F.fq2_mul(F.fq2_mul(a, b), c) == F.fq2_mul(a, F.fq2_mul(b, c))
        assert F.fq2_sqr(a) == F.fq2_mul(a, a)
        assert F.fq2_mul(a, F.fq2_inv(a)) == F.FQ2_ONE
        # frobenius is the q-power map
        assert F.fq2_frobenius(a, 1) == F.fq2_pow(a, F.Q)
        s = F.fq2_sqrt(F.fq2_sqr(a))
        assert s is not None and F.fq2_sqr(s) == F.fq2_sqr(a)


def test_fq6_fq12_laws():
    rng = random.Random(7)

    def rand2():
        return (rng.randrange(F.Q), rng.randrange(F.Q))

    def rand6():
        return (rand2(), rand2(), rand2())

    def rand12():
        return (rand6(), rand6())

    for _ in range(10):
        a, b = rand6(), rand6()
        assert F.fq6_mul(a, b) == F.fq6_mul(b, a)
        assert F.fq6_mul(a, F.fq6_inv(a)) == F.FQ6_ONE
        x, y = rand12(), rand12()
        assert F.fq12_mul(x, y) == F.fq12_mul(y, x)
        assert F.fq12_mul(x, F.fq12_inv(x)) == F.FQ12_ONE
        assert F.fq12_sqr(x) == F.fq12_mul(x, x)
        # frobenius consistency: frob^12 = identity
        z = x
        for _ in range(12):
            z = F.fq12_frobenius(z, 1)
        assert z == x
        assert F.fq12_frobenius(x, 2) == F.fq12_frobenius(
            F.fq12_frobenius(x, 1), 1
        )


def test_fq12_mul_by_014_matches_dense():
    rng = random.Random(5)

    def rand2():
        return (rng.randrange(F.Q), rng.randrange(F.Q))

    def rand12():
        return (
            (rand2(), rand2(), rand2()),
            (rand2(), rand2(), rand2()),
        )

    for _ in range(5):
        a = rand12()
        c0, c1, c4 = rand2(), rand2(), rand2()
        sparse = ((c0, c1, F.FQ2_ZERO), (F.FQ2_ZERO, c4, F.FQ2_ZERO))
        assert F.fq12_mul_by_014(a, c0, c1, c4) == F.fq12_mul(a, sparse)
