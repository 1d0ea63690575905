"""Batch RedDSA verification: host loop vs the DEVICE batched kernel
(protocol/redjubjub.batch_verify_device — the north-star "batch RedDSA
verify" workload; reference semantics redjubjub.rs:166-204)."""

import numpy as np

from zerochain_tpu.protocol.redjubjub import (
    PrivateKey, Signature, batch_verify, batch_verify_device,
)


def _sigs(n, tamper_at=None):
    entries = []
    for i in range(n):
        sk = PrivateKey(
            int.from_bytes(f"batch-sk-{i}".encode().ljust(16, b"\0"),
                           "little")
        )
        msg = f"message-{i}".encode()
        sig = sk.sign(msg, t=bytes(((i + j) % 251 for j in range(80))))
        if tamper_at == i:
            msg = b"tampered"
        entries.append((sk.public_key(), msg, sig))
    return entries


def test_batch_verify_device_128():
    n = 128
    entries = _sigs(n)
    zs = [3 + 11 * i for i in range(n)]
    assert batch_verify(entries, rand_scalars=zs)
    assert batch_verify_device(entries, rand_scalars=zs)


def test_batch_verify_device_rejects_tampered():
    n = 16
    entries = _sigs(n, tamper_at=7)
    zs = [5 + 7 * i for i in range(n)]
    assert not batch_verify(entries, rand_scalars=zs)
    assert not batch_verify_device(entries, rand_scalars=zs)


def test_batch_verify_device_rejects_bad_s():
    from zerochain_tpu.mirror.field import S

    entries = _sigs(2)
    pk, msg, sig = entries[1]
    bad = Signature(sig.rbar, (S + 1).to_bytes(32, "little"))
    assert not batch_verify_device([entries[0], (pk, msg, bad)])
