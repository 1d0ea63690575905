"""Compiled TPU witness generator vs the Python circuit synthesis (oracle).

Bit-exactness of every aux variable and public input, batched over 2 proofs.

Gated behind ZEROCHAIN_WITNESS=1: XLA:CPU's LLVM backend intermittently
segfaults compiling the ~20k-constraint witness module (the TPU backend
compiles it fine — __graft_entry__.entry() exercises the same graph there).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("ZEROCHAIN_WITNESS"),
    reason="set ZEROCHAIN_WITNESS=1 (XLA:CPU LLVM is flaky on this module)",
)

from zerochain_tpu.ff import limbs as L
from zerochain_tpu.mirror import jubjub as jj
from zerochain_tpu.mirror.field import S
from zerochain_tpu.models.confidential import ConfidentialTransfer
from zerochain_tpu.protocol.elgamal import Ciphertext
from zerochain_tpu.protocol.keys import EncryptionKey, ProofGenerationKey
from zerochain_tpu.prover_tpu import witness as wit
from zerochain_tpu.r1cs.system import ConstraintSystem

FR = L.FR


def _make_assignment(seed: bytes, amount=10, fee=1, current=27, remaining=16):
    pgk = ProofGenerationKey.from_seed(seed)
    dec_key = pgk.into_decryption_key()
    enc_key_sender = EncryptionKey.from_decryption_key(dec_key)
    enc_key_recipient = EncryptionKey.from_seed(seed + b"recipient")

    randomness = int.from_bytes(seed.ljust(32, b"r"), "little") % S
    alpha = int.from_bytes(seed.ljust(32, b"a"), "big") % S
    ct_balance = Ciphertext.encrypt(current, randomness * 7 % S, enc_key_sender)
    g_epoch = jj.find_group_hash(b"\x07\x00\x00\x00", b"zcgepoch")

    circuit = ConfidentialTransfer(
        amount=amount,
        remaining_balance=remaining,
        randomness=randomness,
        alpha=alpha,
        proof_generation_key=pgk.point,
        dec_key_sender=dec_key.fs,
        enc_key_recipient=enc_key_recipient.point,
        encrypted_balance=(ct_balance.left, ct_balance.right),
        fee=fee,
        g_epoch=g_epoch,
    )
    assignment = dict(
        amount=amount,
        remaining_balance=remaining,
        fee=fee,
        dec_key=dec_key.fs,
        randomness=randomness,
        alpha=alpha,
        enc_key_recipient=enc_key_recipient.point,
        enc_balance_left=ct_balance.left,
        enc_balance_right=ct_balance.right,
        pgk=pgk.point,
        g_epoch=g_epoch,
    )
    return circuit, assignment


def test_witness_matches_python_synthesis():
    circuits, assignments = zip(
        *[_make_assignment(b"seed-A"), _make_assignment(b"seed-B", amount=3,
                                                        current=9, remaining=5)]
    )

    inputs = wit.witness_inputs_host(list(assignments))
    aux_dev, pub_dev = wit.confidential_witness_jit(**inputs)

    aux_np = np.asarray(aux_dev)
    pub_np = np.asarray(pub_dev)

    for b, circuit in enumerate(circuits):
        cs = ConstraintSystem()
        circuit.synthesize(cs)
        assert cs.is_satisfied()

        got_pub = L.from_limbs(FR, pub_np[:, :, b], mont=True)
        assert got_pub == cs.inputs, "public inputs mismatch"

        got_aux = L.from_limbs(FR, aux_np[:, :, b], mont=True)
        assert len(got_aux) == len(cs.aux), (
            f"aux length {len(got_aux)} != {len(cs.aux)}"
        )
        if got_aux != cs.aux:
            for i, (g, e) in enumerate(zip(got_aux, cs.aux)):
                assert g == e, (
                    f"aux[{i}] mismatch ({cs.aux_names[i]}): {g} != {e}"
                )
