"""The zk-SNARK circuits (the framework's "model" zoo).

- ``confidential``: ConfidentialTransfer — 19,974 constraints, 23 public
  inputs (reference core/proofs/src/circuit/confidential_transfer.rs).
- ``anonymous``: AnonymousTransfer over a 12-member anonymity set
  (reference core/proofs/src/circuit/anonymous_transfer.rs).
"""

from .confidential import ConfidentialTransfer
from .anonymous import AnonymousTransfer, ANONIMITY_SIZE
