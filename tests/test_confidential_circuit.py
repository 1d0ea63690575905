"""Golden tests for the ConfidentialTransfer circuit.

Parity anchors (reference confidential_transfer.rs:383-409):
  * 19,974 constraints
  * BLAKE2s CS hash d23c92fb...
  * 23 public inputs with the exact namespace paths
"""

import pytest

from zerochain_tpu.mirror import jubjub as jj
from zerochain_tpu.mirror.field import S
from zerochain_tpu.models.confidential import ConfidentialTransfer
from zerochain_tpu.protocol.elgamal import Ciphertext
from zerochain_tpu.protocol.keys import (
    EncryptionKey,
    ProofGenerationKey,
)
from zerochain_tpu.r1cs.system import ConstraintSystem

GOLDEN_CONSTRAINTS = 19974
GOLDEN_HASH = "d23c92fb60ee547d45118e160679929cfa186957280673af62f09fa12d401784"


def _witness(amount, fee=1, current_balance=27, remaining_balance=16):
    pgk = ProofGenerationKey.from_seed(b"sender seed for confidential test")
    dec_key = pgk.into_decryption_key()
    enc_key_sender = EncryptionKey.from_decryption_key(dec_key)
    enc_key_recipient = EncryptionKey.from_seed(b"recipient seed")

    randomness_balance = 0x1234567890ABCDEF % S
    randomness_amount = 0xFEDCBA9876543210FEDCBA9876543210 % S
    alpha = 0xA1FA % S

    ct_balance = Ciphertext.encrypt(
        current_balance, randomness_balance, enc_key_sender
    )
    g_epoch = jj.find_group_hash(b"\x05\x00\x00\x00", b"zcgepoch")
    nonce = jj.mul(g_epoch, dec_key.fs)
    rvk = pgk.into_rvk(alpha)

    circuit = ConfidentialTransfer(
        amount=amount,
        remaining_balance=remaining_balance,
        randomness=randomness_amount,
        alpha=alpha,
        proof_generation_key=pgk.point,
        dec_key_sender=dec_key.fs,
        enc_key_recipient=enc_key_recipient.point,
        encrypted_balance=(ct_balance.left, ct_balance.right),
        fee=fee,
        g_epoch=g_epoch,
    )
    aux = dict(
        enc_key_sender=enc_key_sender.point,
        enc_key_recipient=enc_key_recipient.point,
        ct_amount_sender=Ciphertext.encrypt(
            amount, randomness_amount, enc_key_sender
        ),
        ct_amount_recipient=Ciphertext.encrypt(
            amount, randomness_amount, enc_key_recipient
        ),
        ct_fee_sender=Ciphertext.encrypt(fee, randomness_amount, enc_key_sender),
        ct_balance=ct_balance,
        rvk=rvk,
        g_epoch=g_epoch,
        nonce=nonce,
    )
    return circuit, aux


def test_setup_mode_structure():
    """Setup-mode synthesis (no witness) reproduces count + golden hash."""
    cs = ConstraintSystem(track_names=False)
    ConfidentialTransfer().synthesize(cs)
    assert cs.num_constraints == GOLDEN_CONSTRAINTS
    assert cs.num_inputs == 23
    assert cs.hash() == GOLDEN_HASH


def test_valid_witness_satisfies_and_inputs_match():
    # balance equation: current = remaining + amount + fee -> 27 = 16+10+1
    circuit, aux = _witness(amount=10)
    cs = ConstraintSystem()
    circuit.synthesize(cs)

    assert cs.num_constraints == GOLDEN_CONSTRAINTS
    assert cs.hash() == GOLDEN_HASH
    unsat = cs.which_is_unsatisfied()
    assert unsat is None, f"unsatisfied at {unsat}"
    assert cs.num_inputs == 23

    checks = [
        (1, "inputize enc_key_sender/x/input variable", aux["enc_key_sender"][0]),
        (2, "inputize enc_key_sender/y/input variable", aux["enc_key_sender"][1]),
        (3, "inputize enc_key_recipient/x/input variable", aux["enc_key_recipient"][0]),
        (4, "inputize enc_key_recipient/y/input variable", aux["enc_key_recipient"][1]),
        (5, "c_left_sender/x/input variable", aux["ct_amount_sender"].left[0]),
        (6, "c_left_sender/y/input variable", aux["ct_amount_sender"].left[1]),
        (7, "c_left_recipient/x/input variable", aux["ct_amount_recipient"].left[0]),
        (8, "c_left_recipient/y/input variable", aux["ct_amount_recipient"].left[1]),
        (9, "c_right/x/input variable", aux["ct_amount_sender"].right[0]),
        (10, "c_right/y/input variable", aux["ct_amount_sender"].right[1]),
        (11, "f_left_sender/x/input variable", aux["ct_fee_sender"].left[0]),
        (12, "f_left_sender/y/input variable", aux["ct_fee_sender"].left[1]),
        (13, "inputize enc_balance_left/x/input variable", aux["ct_balance"].left[0]),
        (14, "inputize enc_balance_left/y/input variable", aux["ct_balance"].left[1]),
        (15, "inputize enc_balance_right/x/input variable", aux["ct_balance"].right[0]),
        (16, "inputize enc_balance_right/y/input variable", aux["ct_balance"].right[1]),
        (17, "inputize rvk/rvk/x/input variable", aux["rvk"][0]),
        (18, "inputize rvk/rvk/y/input variable", aux["rvk"][1]),
        (19, "inputize g_epoch and nonce/inputize g_epoch/x/input variable", aux["g_epoch"][0]),
        (20, "inputize g_epoch and nonce/inputize g_epoch/y/input variable", aux["g_epoch"][1]),
        (21, "inputize g_epoch and nonce/inputize nonce/x/input variable", aux["nonce"][0]),
        (22, "inputize g_epoch and nonce/inputize nonce/y/input variable", aux["nonce"][1]),
    ]
    for idx, path, expected in checks:
        assert cs.get_input(idx, path) == expected, path


def test_invalid_witness_unsatisfied():
    """Wrong amount (11 instead of 10) breaks the balance equation."""
    circuit, _ = _witness(amount=11)
    cs = ConstraintSystem(track_names=False)
    circuit.synthesize(cs)
    assert not cs.is_satisfied()
