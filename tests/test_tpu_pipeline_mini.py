"""Default-suite end-to-end TPU-pipeline proof on the MiniCommit fixture.

Drives the SAME witness -> matvec -> NTT quotient -> chunked MSM ->
assembly machinery as the flagship provers (which stay env-gated purely
for compile cost), at a scale the CPU backend compiles in ~a minute:
on-device CRS generation, a 2-proof batch, mirror-pairing verification,
and rejection of a perturbed public input."""

def test_mini_pipeline_end_to_end(monkeypatch):
    monkeypatch.setenv("ZEROCHAIN_MSM_CHUNK", "256")
    from zerochain_tpu.groth16.core import (
        prepare_verifying_key,
        verify_proof,
    )
    from zerochain_tpu.prover_tpu.pipeline import MiniProver

    prover = MiniProver.from_toxic_waste(
        tau=424242, alpha=111, beta=222, gamma=333, delta=444,
        chunk=256, chunk_g2=256,
    )
    assignments = [dict(amount=10), dict(amount=0xFFFF0001)]
    # rs=None: the os.urandom sampling path real proving uses
    proofs = prover.prove(assignments)

    pvk = prepare_verifying_key(prover.vk)
    pubs = prover.public_inputs(assignments)
    for proof, pub in zip(proofs, pubs):
        assert len(pub) == 2
        assert verify_proof(pvk, proof, pub)
    bad = [pubs[0][0], (pubs[0][1] + 1)]
    assert not verify_proof(pvk, proofs[0], bad)
    assert not verify_proof(pvk, proofs[0], pubs[1])
