"""Mirror curve/jubjub tests incl. the reference's golden encoding vectors."""

import random

from zerochain_tpu.mirror import curves as C
from zerochain_tpu.mirror import field as F
from zerochain_tpu.mirror import jubjub as J


def test_generators_on_curve_in_subgroup():
    assert C.g1_is_on_curve(C.G1_GEN)
    assert C.g1_in_subgroup(C.G1_GEN)
    assert C.g2_is_on_curve(C.G2_GEN)
    assert C.g2_mul_raw(C.G2_GEN, F.R) is None


def test_g1_generator_matches_reference_decimal():
    # ec.rs comment (fq.rs:79-82)
    assert C.G1_GEN[0] == int(
        "368541675371338701678108831518307775796162079578254640989457837868"
        "8607592378376318836054947676345821548104185464507"
    )
    assert C.G1_GEN[1] == int(
        "133950654494447647302047137994192122158493387593834962042654373641"
        "6511423956333506472724655353366534992391756441569"
    )


def test_group_laws_g1_g2():
    rng = random.Random(42)
    for _ in range(10):
        a = rng.randrange(F.R)
        b = rng.randrange(F.R)
        pa = C.g1_mul(C.G1_GEN, a)
        pb = C.g1_mul(C.G1_GEN, b)
        assert C.g1_add(pa, pb) == C.g1_mul(C.G1_GEN, (a + b) % F.R)
        assert C.g1_add(pa, C.g1_neg(pa)) is None
        assert C.g1_double(pa) == C.g1_add(pa, pa)
        qa = C.g2_mul(C.G2_GEN, a)
        qb = C.g2_mul(C.G2_GEN, b)
        assert C.g2_add(qa, qb) == C.g2_mul(C.G2_GEN, (a + b) % F.R)


def test_codec_roundtrip():
    rng = random.Random(43)
    for _ in range(5):
        p = C.g1_mul(C.G1_GEN, rng.randrange(F.R))
        assert C.g1_from_uncompressed(C.g1_to_uncompressed(p)) == p
        assert C.g1_from_compressed(C.g1_to_compressed(p)) == p
        q = C.g2_mul(C.G2_GEN, rng.randrange(F.R))
        assert C.g2_from_uncompressed(C.g2_to_uncompressed(q)) == q
        assert C.g2_from_compressed(C.g2_to_compressed(q)) == q
    assert C.g1_from_compressed(C.g1_to_compressed(None)) is None
    assert C.g1_from_uncompressed(C.g1_to_uncompressed(None)) is None


def _check_vectors(path, size, encode, decode, add, gen):
    """Reference test (tests/mod.rs:63+): 1000 encodings of 0, G, 2G, ..."""
    data = path.read_bytes()
    assert len(data) == 1000 * size
    e = None
    buf = bytearray()
    for i in range(1000):
        rec = data[i * size : (i + 1) * size]
        dec = decode(rec, check=False)
        assert dec == e, f"mismatch at multiple {i}"
        assert encode(e) == rec, f"re-encode mismatch at multiple {i}"
        buf += rec
        e = add(e, gen)
    assert bytes(buf) == data


def test_g1_golden_encoding_vectors(vectors_dir):
    _check_vectors(
        vectors_dir / "g1_uncompressed_valid_test_vectors.dat",
        96, C.g1_to_uncompressed, C.g1_from_uncompressed, C.g1_add, C.G1_GEN,
    )
    _check_vectors(
        vectors_dir / "g1_compressed_valid_test_vectors.dat",
        48, C.g1_to_compressed, C.g1_from_compressed, C.g1_add, C.G1_GEN,
    )


def test_g2_golden_encoding_vectors(vectors_dir):
    _check_vectors(
        vectors_dir / "g2_uncompressed_valid_test_vectors.dat",
        192, C.g2_to_uncompressed, C.g2_from_uncompressed, C.g2_add, C.G2_GEN,
    )
    _check_vectors(
        vectors_dir / "g2_compressed_valid_test_vectors.dat",
        96, C.g2_to_compressed, C.g2_from_compressed, C.g2_add, C.G2_GEN,
    )


# ---------------------------------------------------------------------------
# Jubjub
# ---------------------------------------------------------------------------

def test_jubjub_constants_match_reference_decimals():
    # curve/mod.rs:216-222 decimal strings
    assert J.EDWARDS_D == int(
        "19257038036680949359750312669786877991949435402254120286184196891"
        "950884077233"
    )
    assert J.MONTGOMERY_A == 40962
    assert J.MONTGOMERY_SCALE == int(
        "17814886934372412843466061268024708274627479829237077604635722030"
        "778476050649"
    ) or (F.R - J.MONTGOMERY_SCALE) == int(
        "17814886934372412843466061268024708274627479829237077604635722030"
        "778476050649"
    )


def test_jubjub_group_law():
    rng = random.Random(44)
    g = J.generator()
    assert J.is_on_curve(g)
    assert J.is_prime_order(g)
    for _ in range(10):
        a = rng.randrange(F.S)
        b = rng.randrange(F.S)
        pa = J.mul(g, a)
        pb = J.mul(g, b)
        assert J.is_on_curve(pa)
        assert J.add(pa, pb) == J.mul(g, (a + b) % F.S)
        assert J.add(pa, J.neg(pa)) == J.ZERO
        assert J.double(pa) == J.add(pa, pa)


def test_jubjub_codec_roundtrip():
    rng = random.Random(45)
    g = J.generator()
    for _ in range(10):
        p = J.mul(g, rng.randrange(F.S))
        assert J.from_bytes(J.to_bytes(p)) == p
        assert J.from_bytes_prime_order(J.to_bytes(p)) == p
    assert J.to_bytes(J.ZERO) == (1).to_bytes(32, "little")


def test_jubjub_montgomery_roundtrip():
    rng = random.Random(46)
    g = J.generator()
    for _ in range(10):
        p = J.mul(g, rng.randrange(F.S))
        m = J.edwards_to_montgomery(p)
        assert J.montgomery_is_on_curve(m)
        assert J.montgomery_to_edwards(m) == p
    # montgomery add agrees with edwards add
    p = J.mul(g, 12345)
    q = J.mul(g, 67890)
    ms = J.montgomery_add(
        J.edwards_to_montgomery(p), J.edwards_to_montgomery(q)
    )
    assert J.montgomery_to_edwards(ms) == J.add(p, q)


def test_fixed_generators_distinct_and_prime_order():
    gens = J.fixed_base_generators()
    assert len(gens) == 6
    for g in gens:
        assert J.is_prime_order(g)
    assert len(set(gens)) == 6
    peds = J.pedersen_hash_generators()
    assert len(set(peds)) == 5
    for g in peds:
        assert J.is_prime_order(g)


def test_fixed_base_circuit_generators_shape():
    windows = J.fixed_base_circuit_generators(J.NOTE_COMMITMENT_RANDOMNESS)
    assert len(windows) == 84
    g = J.generator()
    assert windows[0][0] == J.ZERO
    assert windows[0][1] == g
    assert windows[0][7] == J.mul(g, 7)
    assert windows[1][1] == J.mul(g, 8)
    # window decomposition reconstructs a scalar mul
    k = 0x123456789ABCDEF
    acc = J.ZERO
    tmp = k
    for w in range(84):
        acc = J.add(acc, windows[w][tmp & 7])
        tmp >>= 3
    assert acc == J.mul(g, k)
