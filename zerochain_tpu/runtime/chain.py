"""Minimal chain harness: block numbers + signed-extrinsic application.

The reference's node (Substrate: Aura consensus, libp2p, tx pool) is a host
application, not part of the proving framework; this harness reproduces the
runtime-visible semantics: AccountId = rvk (SigVerificationKey), RedDSA
signature checks on extrinsics (runtime/src/lib.rs:54, modules/executive),
and block-driven epochs.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from ..mirror import jubjub as jj
from ..protocol import redjubjub as rj
from .anonymous_balances import AnonymousBalances
from .encrypted_assets import EncryptedAssets
from .encrypted_balances import DispatchError, EncryptedBalances
from .primitives import SigVerificationKey
from .zk_system import ZkSystem


@dataclass
class Extrinsic:
    """A signed call: module.method(**args), signed by rsk against rvk."""

    module: str
    method: str
    args: dict
    rvk: SigVerificationKey
    signature: rj.Signature | None = None
    nonce_index: int = 0

    def payload(self) -> bytes:
        h = hashlib.blake2b(digest_size=32)
        h.update(self.module.encode())
        h.update(self.method.encode())
        for k in sorted(self.args):
            v = self.args[k]
            h.update(k.encode())
            h.update(self._enc(v))
        h.update(self.rvk.data)
        h.update(self.nonce_index.to_bytes(8, "little"))
        return h.digest()

    @staticmethod
    def _enc(v) -> bytes:
        if hasattr(v, "data"):
            return v.data
        if isinstance(v, (list, tuple)):
            return b"".join(Extrinsic._enc(x) for x in v)
        if isinstance(v, int):
            return v.to_bytes(8, "little")
        if isinstance(v, bytes):
            return v
        raise TypeError(type(v))

    def sign(self, rsk_fs: int, t: bytes | None = None):
        self.signature = rj.PrivateKey(rsk_fs).sign(
            self.payload(), base_index=jj.NOTE_COMMITMENT_RANDOMNESS, t=t
        )
        return self


class Runtime:
    """Composes the modules (reference runtime/src/lib.rs construct_runtime!)."""

    def __init__(self, confidential_vk, anonymous_vk=None, epoch_length=7,
                 check_signatures: bool = True):
        self.block_number = 0
        self.zk_system = ZkSystem(confidential_vk, anonymous_vk, epoch_length)
        self.zk_system._system = self
        self.encrypted_balances = EncryptedBalances(self.zk_system)
        self.encrypted_assets = EncryptedAssets(self.zk_system)
        self.anonymous_balances = AnonymousBalances(self.zk_system)
        self.check_signatures = check_signatures
        self.account_nonce: dict[bytes, int] = {}

    def set_block(self, n: int):
        self.block_number = n

    def next_block(self):
        self.block_number += 1

    def apply_extrinsic(self, xt: Extrinsic):
        """Signature check (RedDSA over rvk) then dispatch."""
        if self.check_signatures:
            if xt.signature is None:
                raise DispatchError("unsigned extrinsic")
            vk = rj.PublicKey(jj.from_bytes(xt.rvk.data))
            if not vk.verify(
                xt.payload(), xt.signature,
                base_index=jj.NOTE_COMMITMENT_RANDOMNESS,
            ):
                raise DispatchError("bad signature")
            expected = self.account_nonce.get(xt.rvk.data, 0)
            if xt.nonce_index != expected:
                raise DispatchError("bad account nonce")
            self.account_nonce[xt.rvk.data] = expected + 1

        module = getattr(self, xt.module)
        method = getattr(module, xt.method)
        return method(xt.rvk, **xt.args)
