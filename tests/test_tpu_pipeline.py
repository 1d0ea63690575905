"""Full TPU proving pipeline vs the mirror verifier.

Compile-heavy (witness graph + matvec + NTT d=32768 + MSMs on the CPU
backend); run with ZEROCHAIN_PIPELINE=1.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("ZEROCHAIN_PIPELINE"),
    reason="set ZEROCHAIN_PIPELINE=1 to run the full TPU pipeline test",
)


def test_pipeline_proves_and_verifies(tmp_path):
    from zerochain_tpu.groth16.core import (
        generate_parameters,
        prepare_verifying_key,
        verify_proof,
    )
    from zerochain_tpu.mirror import jubjub as jj
    from zerochain_tpu.mirror.field import S
    from zerochain_tpu.models.confidential import ConfidentialTransfer
    from zerochain_tpu.protocol.elgamal import Ciphertext
    from zerochain_tpu.protocol.keys import (
        EncryptionKey,
        ProofGenerationKey,
    )
    from zerochain_tpu.prover_tpu.backend import TpuBackend
    from zerochain_tpu.prover_tpu.pipeline import ConfidentialProver

    params = generate_parameters(
        ConfidentialTransfer(),
        tau=1234577, alpha=998877, beta=665544, gamma=332211, delta=118822,
        backend=TpuBackend(),
    )
    prover = ConfidentialProver(params)

    assignments = []
    g_epoch = jj.find_group_hash(b"\x03\x00\x00\x00", b"zcgepoch")
    for i in range(2):
        seed = f"pipe-{i}".encode()
        pgk = ProofGenerationKey.from_seed(seed)
        dk = pgk.into_decryption_key()
        ek_s = EncryptionKey.from_decryption_key(dk)
        ek_r = EncryptionKey.from_seed(seed + b"r")
        ct = Ciphertext.encrypt(27, (0x1111 + i) % S, ek_s)
        assignments.append(
            dict(
                amount=10, remaining_balance=16, fee=1, dec_key=dk.fs,
                randomness=(0x2222 + i) % S, alpha=(7 + i) % S,
                enc_key_recipient=ek_r.point, enc_balance_left=ct.left,
                enc_balance_right=ct.right, pgk=pgk.point, g_epoch=g_epoch,
            )
        )

    proofs = prover.prove(assignments, rs=[(3, 5), (7, 9)])
    pvk = prepare_verifying_key(params.vk)
    pubs = prover.public_inputs(assignments)
    for proof, pub in zip(proofs, pubs):
        assert verify_proof(pvk, proof, pub)
    # proofs are distinct and cross-verification fails
    assert not verify_proof(pvk, proofs[0], pubs[1])
