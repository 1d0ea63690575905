"""AnonymousTransfer circuit (reference anonymous_transfer.rs).

Implemented after the confidential slice; see anonimity_set.rs for the
one-hot selector machinery.
"""

from __future__ import annotations

from dataclasses import dataclass

ANONIMITY_SIZE = 12  # reference core/proofs/src/constants.rs:1-2


@dataclass
class AnonymousTransfer:
    amount: int | None = None

    def synthesize(self, cs):  # pragma: no cover - placeholder
        raise NotImplementedError("AnonymousTransfer lands after Groth16")
