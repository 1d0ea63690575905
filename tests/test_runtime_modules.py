"""Mock-runtime module tests (reference pattern:
modules/encrypted-balances/src/lib.rs:260-464, encrypted-assets and
anonymous-balances test mods).

Covers: encrypted-assets issue/transfer/destroy with per-(asset, key)
rollover, anonymous-balances dispatch with pending deltas over the
12-member set, wrong-proof rejection leaving storage untouched, and a
REAL Groth16 verification gate in the dispatch loop via the committed
MiniCommit fixture (tests/vectors/mini_*) — compile-free, so the default
suite exercises zk-gated dispatch end-to-end."""

import json
import os

import pytest

from zerochain_tpu.mirror import jubjub as jj
from zerochain_tpu.protocol.elgamal import Ciphertext
from zerochain_tpu.protocol.keys import EncryptionKey
from zerochain_tpu.runtime import Runtime
from zerochain_tpu.runtime.encrypted_balances import DispatchError
from zerochain_tpu.runtime.primitives import (
    CiphertextBytes,
    EncKey,
    LeftCiphertext,
    Nonce,
    ProofBytes,
    RightCiphertext,
    SigVerificationKey,
)

VEC = os.path.join(os.path.dirname(__file__), "vectors")


def _runtime(accept=True):
    rt = Runtime(confidential_vk=None, anonymous_vk=None, epoch_length=7,
                 check_signatures=False)
    calls = []

    def conf(*a, **k):
        calls.append(("conf", a))
        return accept

    def anon(*a, **k):
        calls.append(("anon", a))
        return accept

    rt.zk_system.verify_confidential_proof = conf
    rt.zk_system.verify_anonymous_proof = anon
    rt._calls = calls
    rt.set_block(0)
    return rt


def _addr(seed: bytes) -> EncKey:
    return EncKey.from_point(EncryptionKey.from_seed(seed).point)


def _ct_parts(amount, randomness, seed):
    ek = EncryptionKey.from_seed(seed)
    ct = Ciphertext.encrypt(amount, randomness, ek)
    return (
        LeftCiphertext.from_point(ct.left),
        RightCiphertext.from_point(ct.right),
    )


def _nonce(i: int) -> Nonce:
    return Nonce.from_point(
        jj.mul(jj.generator(jj.NOTE_COMMITMENT_RANDOMNESS), 3 + i)
    )


_PROOF = ProofBytes(bytes(192))
_RVK = SigVerificationKey(bytes(32))


def test_encrypted_assets_issue_transfer_destroy():
    rt = _runtime()
    ea = rt.encrypted_assets
    alice = _addr(b"assets alice")
    bob = _addr(b"assets bob")

    total_l, rand_r = _ct_parts(100, 5, b"assets alice")
    aid = ea.issue(_RVK, _PROOF, alice, total_l, total_l, total_l,
                   rand_r, _nonce(0))
    assert aid == 0
    assert (aid, alice.data) in ea.encrypted_balance
    assert ea.total_supply[aid].data == (total_l.data + rand_r.data)
    # second asset class gets a fresh id
    aid2 = ea.issue(_RVK, _PROOF, alice, total_l, total_l, total_l,
                    rand_r, _nonce(1))
    assert aid2 == 1

    # transfer within asset 0: sender loses amount+fee, recipient pends
    amt_l, r_r = _ct_parts(10, 7, b"assets alice")
    fee_l, _ = _ct_parts(1, 7, b"assets alice")
    before = ea.encrypted_balance[(0, alice.data)]
    ea.confidential_transfer(
        _RVK, 0, _PROOF, alice, bob, amt_l, amt_l, fee_l, r_r, _nonce(2)
    )
    moved = CiphertextBytes.from_left_right(amt_l, r_r).add(
        CiphertextBytes.from_left_right(fee_l, r_r)
    )
    assert ea.encrypted_balance[(0, alice.data)].data == before.sub(
        moved
    ).data
    assert (0, bob.data) in ea.pending_transfer
    # asset-1 balances untouched (per-(asset, key) storage)
    assert ea.encrypted_balance[(1, alice.data)].data == (
        total_l.data + rand_r.data
    )

    # destroy asset 0 for alice: storage entries removed
    ea.destroy(_RVK, _PROOF, alice, 0, amt_l, fee_l, amt_l, r_r,
               _nonce(3))
    assert (0, alice.data) not in ea.encrypted_balance
    assert ea.events[-1][0] == "Destroyed"


def test_encrypted_assets_per_asset_rollover():
    """Pending transfers roll into the balance per (asset, key) when the
    epoch advances (lib.rs:266 semantics)."""
    rt = _runtime()
    ea = rt.encrypted_assets
    bob = _addr(b"rollover bob")
    amt_l, r_r = _ct_parts(10, 3, b"rollover bob")
    pend = CiphertextBytes.from_left_right(amt_l, r_r)
    ea.pending_transfer[(0, bob.data)] = pend
    ea.pending_transfer[(1, bob.data)] = pend.add(pend)

    rt.set_block(7)  # epoch 1
    ea.rollover(bob, 0)
    assert ea.encrypted_balance[(0, bob.data)].data == pend.data
    assert (0, bob.data) not in ea.pending_transfer
    # asset 1 not rolled yet
    assert (1, bob.data) in ea.pending_transfer
    # idempotent within the epoch
    ea.rollover(bob, 0)
    assert ea.encrypted_balance[(0, bob.data)].data == pend.data


def test_encrypted_assets_wrong_proof_rejected():
    rt = _runtime(accept=False)
    ea = rt.encrypted_assets
    alice = _addr(b"reject alice")
    total_l, rand_r = _ct_parts(50, 9, b"reject alice")
    with pytest.raises(DispatchError):
        ea.issue(_RVK, _PROOF, alice, total_l, total_l, total_l, rand_r,
                 _nonce(0))
    assert ("InvalidZkProof",) in ea.events
    assert not ea.encrypted_balance  # nothing minted
    assert not rt.zk_system.nonce_pool  # nonce NOT consumed


def test_anonymous_balances_dispatch():
    rt = _runtime()
    ab = rt.anonymous_balances
    keys = [_addr(f"anon member {i}".encode()) for i in range(12)]
    issuer = keys[0]
    total_l, rand_r = _ct_parts(100, 11, b"anon member 0")
    ab.issue(_RVK, _PROOF, issuer, total_l, total_l, total_l, rand_r,
             _nonce(0))
    assert ab.encrypted_balance[issuer.data].data == (
        total_l.data + rand_r.data
    )

    lefts = [
        _ct_parts(0 if i > 1 else 10, 13, f"anon member {i}".encode())[0]
        for i in range(12)
    ]
    right = _ct_parts(10, 13, b"anon member 0")[1]
    ab.anonymous_transfer(_RVK, _PROOF, keys, lefts, right, _nonce(1))
    # EVERY member of the set received a pending delta
    for i, k in enumerate(keys):
        assert ab.pending_transfer[k.data].data == (
            lefts[i].data + right.data
        )
    assert ab.events[-1][0] == "AnonymousTransfer"

    # mismatched lengths rejected before any verification
    with pytest.raises(DispatchError):
        ab.anonymous_transfer(_RVK, _PROOF, keys, lefts[:11], right,
                              _nonce(2))

    # epoch advance merges pending into balances
    rt.set_block(7)
    ab.rollover(keys[3])
    assert ab.encrypted_balance[keys[3].data].data == (
        lefts[3].data + right.data
    )
    assert keys[3].data not in ab.pending_transfer


def test_zk_gated_dispatch_real_verifier():
    """Dispatch with REAL Groth16 verification deciding accept/reject:
    the committed MiniCommit fixture proof passes the gate and mutates
    storage; a corrupted proof byte is rejected by the PAIRING CHECK
    (not a stub) and storage stays untouched."""
    from zerochain_tpu.groth16.core import (
        prepare_verifying_key, verify_proof,
    )
    from zerochain_tpu.groth16.serialization import (
        proof_from_bytes, vk_from_bytes,
    )

    vk = vk_from_bytes(open(os.path.join(VEC, "mini_vk.dat"), "rb").read())
    pvk = prepare_verifying_key(vk)
    proof_bytes = open(os.path.join(VEC, "mini_proof.dat"), "rb").read()
    pub = [int(x) for x in json.loads(
        open(os.path.join(VEC, "mini_public_inputs.json")).read()
    )]

    rt = Runtime(confidential_vk=pvk, epoch_length=7,
                 check_signatures=False)
    rt.set_block(0)

    def gate(zkproof, *args, **kwargs):
        try:
            proof = proof_from_bytes(zkproof.data)
        except Exception:
            return False
        return verify_proof(rt.zk_system.confidential_vk, proof, pub)

    rt.zk_system.verify_confidential_proof = gate
    ea = rt.encrypted_assets
    alice = _addr(b"real alice")
    total_l, rand_r = _ct_parts(40, 21, b"real alice")

    aid = ea.issue(_RVK, ProofBytes(proof_bytes), alice, total_l,
                   total_l, total_l, rand_r, _nonce(0))
    assert (aid, alice.data) in ea.encrypted_balance

    bad = bytearray(proof_bytes)
    bad[5] ^= 0x40  # corrupt a coordinate bit (stays decodable or not —
    # either way the gate must reject)
    with pytest.raises(DispatchError):
        ea.issue(_RVK, ProofBytes(bytes(bad)), alice, total_l, total_l,
                 total_l, rand_r, _nonce(1))
    assert ea.next_asset_id == aid + 1  # no second mint
