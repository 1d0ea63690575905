"""Anonymous-transfer TPU proving pipeline vs the mirror verifier.

The heavier half of the reference's proving surface (~50k constraints,
anonymous_transfer.rs:57) through the same witness→NTT→MSM→assembly
pipeline.  Compile-heavy; run with ZEROCHAIN_PIPELINE=1 (the driver bench
exercises the confidential twin on real hardware every round).
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("ZEROCHAIN_PIPELINE"),
    reason="set ZEROCHAIN_PIPELINE=1 to run the full TPU pipeline test",
)


def test_anonymous_pipeline_proves_and_verifies():
    from zerochain_tpu.groth16.core import (
        prepare_verifying_key,
        verify_proof,
    )
    from zerochain_tpu.prover_tpu.pipeline import AnonymousProver
    from tests.test_tpu_witness_anon import make_assignment

    prover = AnonymousProver.from_toxic_waste(
        tau=1234577, alpha=998877, beta=665544, gamma=332211, delta=118822,
    )

    _, a0 = make_assignment(b"anon-pipe-0")
    _, a1 = make_assignment(b"anon-pipe-1", amount=4, current=50,
                            remaining=46, s_index=0, t_index=11)
    assignments = [a0, a1]

    proofs = prover.prove(assignments, rs=[(3, 5), (7, 9)])
    pvk = prepare_verifying_key(prover.vk)
    pubs = prover.public_inputs(assignments)
    assert all(len(p) == 104 for p in pubs)
    for proof, pub in zip(proofs, pubs):
        assert verify_proof(pvk, proof, pub)
    assert not verify_proof(pvk, proofs[0], pubs[1])
