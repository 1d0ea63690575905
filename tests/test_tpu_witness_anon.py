"""Compiled AnonymousTransfer witness generator vs Python synthesis (oracle).

Bit-exactness of every aux variable and all 105 public inputs, batched
over 2 proofs.  Gated behind ZEROCHAIN_WITNESS=1 like the confidential
twin (XLA:CPU LLVM is flaky on graphs this size; the TPU pipeline test
exercises the same graph on hardware).
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
from zerochain_tpu.models.anonymous import AnonymousTransfer
from zerochain_tpu.protocol.elgamal import Ciphertext
from zerochain_tpu.protocol.keys import EncryptionKey, ProofGenerationKey
from zerochain_tpu.prover_tpu import witness_anon as wa
from zerochain_tpu.r1cs.system import ConstraintSystem

FR = L.FR


def make_assignment(seed: bytes, amount=10, remaining=90, current=100,
                    s_index=3, t_index=7):
    pgk = ProofGenerationKey.from_seed(seed)
    dec_key = pgk.into_decryption_key()
    ek_sender = EncryptionKey.from_decryption_key(dec_key)
    ek_recipient = EncryptionKey.from_seed(seed + b"recipient")
    decoys = [
        EncryptionKey.from_seed(seed + b"decoy %d" % i).point
        for i in range(10)
    ]

    randomness = int.from_bytes(seed.ljust(32, b"r"), "little") % S
    alpha = int.from_bytes(seed.ljust(32, b"a"), "big") % S

    lo, hi = sorted((s_index, t_index))
    enc_keys = list(decoys)
    enc_keys.insert(lo, ek_sender.point if lo == s_index
                    else ek_recipient.point)
    enc_keys.insert(hi, ek_sender.point if hi == s_index
                    else ek_recipient.point)

    def insert_pair(lst, s_val, t_val):
        out = list(lst)
        out.insert(lo, s_val if lo == s_index else t_val)
        out.insert(hi, s_val if hi == s_index else t_val)
        return out

    lcs = insert_pair(
        [Ciphertext.encrypt(0, randomness, EncryptionKey(d)).left
         for d in decoys],
        Ciphertext.neg_encrypt(amount, randomness, ek_sender).left,
        Ciphertext.encrypt(amount, randomness, ek_recipient).left,
    )
    right_ct = Ciphertext.encrypt(amount, randomness, ek_sender).right

    balances = insert_pair(
        [Ciphertext.encrypt(10 + i, (0x100 + i) % S, EncryptionKey(d))
         for i, d in enumerate(decoys)],
        Ciphertext.encrypt(current, 0x71 % S, ek_sender),
        Ciphertext.encrypt(55, 0x72 % S, ek_recipient),
    )

    g_epoch = jj.find_group_hash(b"\x09\x00\x00\x00", b"zcgepoch")

    circuit = AnonymousTransfer(
        amount=amount,
        remaining_balance=remaining,
        s_index=s_index,
        t_index=t_index,
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
    assignment = dict(
        amount=amount,
        remaining_balance=remaining,
        s_index=s_index,
        t_index=t_index,
        dec_key=dec_key.fs,
        randomness=randomness,
        alpha=alpha,
        enc_keys=enc_keys,
        left_ciphertexts=lcs,
        enc_balances=[(b.left, b.right) for b in balances],
        pgk=pgk.point,
        g_epoch=g_epoch,
    )
    return circuit, assignment


def test_anon_witness_matches_python_synthesis():
    circuits, assignments = zip(
        *[
            make_assignment(b"anon-A"),
            make_assignment(b"anon-B", amount=3, current=9, remaining=6,
                            s_index=11, t_index=0),
        ]
    )

    inputs = wa.witness_inputs_host(list(assignments))
    aux_dev, pub_dev = wa.anonymous_witness_jit(**inputs)

    aux_np = np.asarray(aux_dev)
    pub_np = np.asarray(pub_dev)

    for b, circuit in enumerate(circuits):
        cs = ConstraintSystem()
        circuit.synthesize(cs)
        assert cs.is_satisfied()
        assert cs.num_inputs == 105

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
