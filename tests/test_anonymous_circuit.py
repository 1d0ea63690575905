"""AnonymousTransfer circuit: satisfiability, input layout, structure.

The reference's golden numbers are commented out / stale
(anonymous_transfer.rs:449-451: 50634 constraints, 105 inputs); we assert
the measured structure of the faithfully-reproduced circuit and the exact
runtime-visible input layout (anonymous_transfer.rs:453-478).
"""

import pytest

from zerochain_tpu.mirror import jubjub as jj
from zerochain_tpu.mirror.field import S
from zerochain_tpu.models.anonymous import ANONIMITY_SIZE, AnonymousTransfer
from zerochain_tpu.protocol.elgamal import Ciphertext
from zerochain_tpu.protocol.keys import EncryptionKey, ProofGenerationKey
from zerochain_tpu.r1cs.system import ConstraintSystem

S_INDEX, T_INDEX = 3, 7  # t > s so insert-order keeps positions


def _witness(amount, current_balance_sender=100, remaining_balance=90):
    pgk = ProofGenerationKey.from_seed(b"anon sender seed")
    dec_key = pgk.into_decryption_key()
    ek_sender = EncryptionKey.from_decryption_key(dec_key)
    ek_recipient = EncryptionKey.from_seed(b"anon recipient seed")
    decoys = [
        EncryptionKey.from_seed(b"decoy %d" % i).point for i in range(10)
    ]

    randomness = 0xA5A5A5A5A5A5 % S
    alpha = 0x51 % S

    enc_keys = list(decoys)
    enc_keys.insert(S_INDEX, ek_sender.point)
    enc_keys.insert(T_INDEX, ek_recipient.point)

    lc_sender = Ciphertext.neg_encrypt(amount, randomness, ek_sender).left
    lc_recipient = Ciphertext.encrypt(
        amount, randomness, ek_recipient
    ).left
    lcs = [
        Ciphertext.encrypt(0, randomness, EncryptionKey(d)).left
        for d in decoys
    ]
    lcs.insert(S_INDEX, lc_sender)
    lcs.insert(T_INDEX, lc_recipient)
    right_ct = Ciphertext.encrypt(amount, randomness, ek_sender).right

    bal_sender = Ciphertext.encrypt(
        current_balance_sender, 0x71 % S, ek_sender
    )
    bal_recipient = Ciphertext.encrypt(55, 0x72 % S, ek_recipient)
    balances = [
        Ciphertext.encrypt(10 + i, (0x100 + i) % S, EncryptionKey(d))
        for i, d in enumerate(decoys)
    ]
    balances.insert(S_INDEX, bal_sender)
    balances.insert(T_INDEX, bal_recipient)

    g_epoch = jj.find_group_hash(b"\x09\x00\x00\x00", b"zcgepoch")
    nonce = jj.mul(g_epoch, dec_key.fs)
    rvk = pgk.into_rvk(alpha)

    circuit = AnonymousTransfer(
        amount=amount,
        remaining_balance=remaining_balance,
        s_index=S_INDEX,
        t_index=T_INDEX,
        randomness=randomness,
        alpha=alpha,
        proof_generation_key=pgk.point,
        dec_key=dec_key.fs,
        enc_keys=enc_keys,
        left_ciphertexts=lcs,
        right_ciphertext=right_ct,
        enc_balances=[(b.left, b.right) for b in balances],
        g_epoch=g_epoch,
    )
    aux = dict(
        enc_keys=enc_keys, lcs=lcs, right_ct=right_ct,
        balances=balances, rvk=rvk, g_epoch=g_epoch, nonce=nonce,
    )
    return circuit, aux


@pytest.fixture(scope="module")
def synthesized():
    circuit, aux = _witness(amount=10)
    cs = ConstraintSystem()
    circuit.synthesize(cs)
    return cs, aux


def test_satisfied_and_input_layout(synthesized):
    cs, aux = synthesized
    unsat = cs.which_is_unsatisfied()
    assert unsat is None, f"unsatisfied at {unsat}"
    assert cs.num_inputs == 105

    n = ANONIMITY_SIZE
    for i, ek in enumerate(aux["enc_keys"]):
        assert cs.get_input(
            (i + 1) * 2 - 1,
            f"inputize enc key set/inputize enc keys {i}/x/input variable",
        ) == ek[0]
        assert cs.get_input((i + 1) * 2) == ek[1]
    for i, lc in enumerate(aux["lcs"]):
        assert cs.get_input(
            (n + i + 1) * 2 - 1,
            f"inputize ciphertext left set/inputize left ciphertexts {i}"
            "/x/input variable",
        ) == lc[0]
        assert cs.get_input((n + i + 1) * 2) == lc[1]
    for i, b in enumerate(aux["balances"]):
        assert cs.get_input((i + 1) * 2 - 1 + n * 4) == b.left[0]
        assert cs.get_input((i + 1) * 2 + n * 4) == b.left[1]
        assert cs.get_input((i + 1) * 2 - 1 + n * 6) == b.right[0]
        assert cs.get_input((i + 1) * 2 + n * 6) == b.right[1]
    assert cs.get_input(
        n * 8 + 1, "inputize right amount ciphertext./x/input variable"
    ) == aux["right_ct"][0]
    assert cs.get_input(n * 8 + 2) == aux["right_ct"][1]
    assert cs.get_input(n * 8 + 3, "inputize rvk/rvk/x/input variable") == aux["rvk"][0]
    assert cs.get_input(n * 8 + 4) == aux["rvk"][1]
    assert cs.get_input(n * 8 + 5) == aux["g_epoch"][0]
    assert cs.get_input(n * 8 + 6) == aux["g_epoch"][1]
    assert cs.get_input(n * 8 + 7) == aux["nonce"][0]
    assert cs.get_input(n * 8 + 8) == aux["nonce"][1]


# Per-namespace golden constraint counts, cross-walked one-for-one against
# the reference's synthesize() (anonymous_transfer.rs:67-331: same 41
# namespaces, same order).  Every gadget cost below is independently
# verified by the ConfidentialTransfer golden CS hash (d23c92fb..., which
# our synthesis reproduces bit-for-bit), so the total 50,514 is the
# analytic count of the CURRENT reference source; the commented-out golden
# 50,634 (anonymous_transfer.rs:449) is stale (predates source changes).
GOLDEN_NAMESPACE_COUNTS = {
    "initialize acc.": 4,
    "range proof of amount": 63,
    "compute the amount in the exponent": 92,
    "range proof of remaining_balance": 63,
    "compute the remaining balance in the exponent": 92,
    "dec_key": 252,
    "new s binary": 12,
    "new t binary": 12,
    "push enckeys": 48,
    "add folded enc keys": 96,
    "compute enc_key_sender": 750,
    "equal enc_key_sender": 2,
    # 12 variable-base muls of the 252-bit randomness: 12 * 3,286
    "generate enc keys multipled by randomness": 39432,
    "ciphertext_left_set": 48,
    "add folded enc keys mul random": 96,
    "compute ciphertext left t_i": 6,
    "add folded left ciphertext based in t_i": 96,
    "left ciphertext equals based in t_i": 2,
    "s_i xor t_i": 12,
    "add folded randomized enc keys based in (s_i xor t_i)": 96,
    "add folded left ciphertext based in (s_i xor t_i)": 96,
    "left ciphertext equals based in (s_i xor t_i)": 2,
    "s_i nor t_i": 12,
    "equal a and b in nor st": 72,
    "inputize enc key set": 24,
    "inputize ciphertext left set": 24,
    "left balance ciphertexts witness": 48,
    "add each with left amount ciphertexts": 72,
    "Add folded C_l minus C": 96,
    "right balance ciphertexts witness": 48,
    "add folded right balance ciphertexts": 96,
    "randomness_bits": 252,
    "compute the right elgamal component": 750,
    "amount minus balance ciphertext": 6,
    "cr_minus_d mul sk": 3265,
    "rb_g adds cr_minus_d_mul_sk": 6,
    "rl_c equals to rh_c": 2,
    "inputize left balance ciphertext": 24,
    "inputize right balance ciphertext": 24,
    "inputize right amount ciphertext.": 2,
    "inputize rvk": 1046,
    "inputize g_epoch and nonce": 3273,
}


def test_structure_stable(synthesized):
    """Pin the analytically-verified structure (see table above)."""
    cs, _ = synthesized
    setup_cs = ConstraintSystem(track_names=False)
    AnonymousTransfer().synthesize(setup_cs)
    assert setup_cs.num_constraints == cs.num_constraints
    assert setup_cs.num_inputs == 105
    assert setup_cs.hash() == cs.hash()
    assert cs.num_constraints == sum(GOLDEN_NAMESPACE_COUNTS.values()) == 50514


def test_namespace_breakdown(synthesized):
    """Per-namespace counts match the reference synthesize() cross-walk."""
    import collections

    cs, _ = synthesized
    buckets = collections.Counter(
        name.split("/")[0] for name in cs.constraint_names
    )
    assert dict(buckets) == GOLDEN_NAMESPACE_COUNTS


def test_invalid_amount_unsatisfied():
    circuit, _ = _witness(amount=11)  # balance eq: 100 != 90 + 11
    cs = ConstraintSystem(track_names=False)
    circuit.synthesize(cs)
    assert not cs.is_satisfied()
