"""Zerochain protocol layer: keys, ElGamal, RedDSA, epochs.

CPU-side Python (thin, off the hot path).  Mirrors the reference's
no_std_aliases/{keys,elgamal}.rs, core/jubjub/src/redjubjub.rs, and
modules/zk-system epoch logic, bit-exactly at the byte boundaries.
"""

from .keys import (
    SpendingKey,
    ProofGenerationKey,
    DecryptionKey,
    EncryptionKey,
)
from .elgamal import Ciphertext, elgamal_extend
from . import redjubjub
