"""Groth16 zk-SNARK: setup, prover, verifier, byte-compatible serialization.

The algorithms mirror the external bellman fork the reference depends on
(SURVEY.md §2.3): CRS generation over an evaluation domain, proving via
3 (i)FFTs + coset quotient + multi-scalar multiplications, verification via
one small MSM + a 3-pair Miller loop (core/bellman-verifier/src/verifier.rs).

The heavy primitives (NTT, MSM) are pluggable: the default backend is the
pure-Python mirror (the oracle); the TPU backend lives in prover_tpu/.
"""

from .core import (
    Parameters,
    VerifyingKey,
    PreparedVerifyingKey,
    Proof,
    generate_parameters,
    generate_random_parameters,
    create_proof,
    create_random_proof,
    prepare_verifying_key,
    verify_proof,
)
from . import serialization
