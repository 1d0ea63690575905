"""zerochain_tpu — a TPU-native zk-SNARK proving framework.

A from-scratch rebuild of the capabilities of LayerXcom/zero-chain
(Zether-style confidential/anonymous payments with Groth16 zk-SNARKs over
BLS12-381 + lifted-ElGamal on Jubjub), designed TPU-first:

- ``mirror``   — pure-Python bigint oracle (bit-exact reference semantics)
- ``ff``       — batched limb field arithmetic as JAX/Pallas kernels
- ``ec``       — batched curve group ops (G1/G2 Jacobian, Jubjub Edwards)
- ``ntt``      — radix-2 NTT over Fr (Groth16 quotient polynomial)
- ``msm``      — Pippenger multi-scalar multiplication (sort + segmented scan)
- ``pairing``  — BLS12-381 Miller loop / final exponentiation
- ``r1cs``     — constraint system + circuit gadget library
- ``models``   — the circuits (ConfidentialTransfer, AnonymousTransfer)
- ``groth16``  — setup / prover / verifier, byte-compatible serialization
- ``prover_tpu`` — compiled batched witness synthesis + proving pipeline
- ``protocol`` — keys, ElGamal, RedDSA (single and multi-party), epochs
- ``runtime``  — on-chain state machines (zk-system, balances, assets)
- ``wallet``   — HD derivation, encrypted keystore, SS58 addresses
- ``tx``       — proof drivers and signed-extrinsic builders
- ``dist``     — multi-chip sharding (mesh MSM, distributed NTT)

Capability parity target: /root/reference (Zerochain). Reference citations in
docstrings are of the form ``file:line`` relative to that tree.
"""

__version__ = "0.1.0"
