"""Pairing vs the RELIC golden vector and bilinearity laws."""

import random

from zerochain_tpu.mirror import curves as C
from zerochain_tpu.mirror import field as F
from zerochain_tpu.mirror import pairing as P

# Golden vector from RELIC (reference
# core/pairing/src/bls12_381/tests/mod.rs:4-60): e(G1::one, G2::one)
RELIC = (
    (
        (
            int("28191056059536912452778030563226840868847030004739610657164"
                "85506033588504203831029066448642358042597501014294104502"),
            int("13239682329869967425713152061514059651042425423396807221642"
                "20900812303524334628370163366153839984196298685227734799"),
        ),
        (
            int("29873350497213125044286029884476163288303417223769622140116"
                "74875969052835043875658579425548512925634040144704192135"),
            int("38797235824525524525386843144790819675021114974130765988161"
                "63759028842927668327542875108457755966417881797966271311"),
        ),
        (
            int("26150818251799700317138574337465333918605951849423954313983"
                "9025878870012614975302676296704930880982238308326681253"),
            int("23148899224646045966381359834244866985447394210505438151134"
                "6786719005883340876032043606739070883099647773793170614"),
        ),
    ),
    (
        (
            int("39935820955164226587736690689313611341887381597667155761874"
                "90305611759126554796569868053818105850661142222948198557"),
            int("10747735116984223445022640061598597105021640459114127508316"
                "41680783012525555872467108249271286757399121183508900634"),
        ),
        (
            int("27275882990835456867390243179985127405611670110469402499885"
                "57419323068809019137624943703910267790601287073339193943"),
            int("49364329981443764091474567785436967004108034434960750465654"
                "3355799077485536288866009245028091988146107059514546594"),
        ),
        (
            int("73440133219664144183943910594262314123414895797240778225735"
                "5060229193854324927417865401895596108124443575283868655"),
            int("23483300982885564209186725029236649526201524831285934843017"
                "59394583320358354186482723629999370241674973832318248497"),
        ),
    ),
)


def test_pairing_against_relic():
    assert P.pairing(C.G1_GEN, C.G2_GEN) == RELIC


def test_bilinearity():
    rng = random.Random(7)
    a = rng.randrange(1, F.R)
    b = rng.randrange(1, F.R)
    pa = C.g1_mul(C.G1_GEN, a)
    qb = C.g2_mul(C.G2_GEN, b)
    lhs = P.pairing(pa, qb)
    rhs = F.fq12_pow(P.pairing(C.G1_GEN, C.G2_GEN), a * b % F.R)
    assert lhs == rhs
    # e(P, -Q) = e(P, Q)^-1 = e(-P, Q)
    assert P.pairing(pa, C.g2_neg(qb)) == F.fq12_inv(lhs)
    assert P.pairing(C.g1_neg(pa), qb) == F.fq12_inv(lhs)


def test_multi_pair_miller_loop():
    """Product form used by the Groth16 verifier (verifier.rs:50-62)."""
    rng = random.Random(8)
    a = rng.randrange(1, F.R)
    p = C.g1_mul(C.G1_GEN, a)
    q = C.G2_GEN
    # e(P, Q) * e(-P, Q) == 1
    f = P.final_exponentiation(
        P.miller_loop([(p, q), (C.g1_neg(p), q)])
    )
    assert f == F.FQ12_ONE


def test_pairing_with_infinity_is_one():
    assert P.final_exponentiation(P.miller_loop([(None, C.G2_GEN)])) == F.FQ12_ONE
    assert P.final_exponentiation(P.miller_loop([(C.G1_GEN, None)])) == F.FQ12_ONE
