"""SCALE (parity-codec) wire-format vectors + extrinsic round-trips.

Compact/Vec vectors are hand-computed from the SCALE spec the reference's
parity-codec implements; the call layout mirrors decl_module! signatures
(reference modules/*/src/lib.rs) and construct_runtime! ordering
(reference runtime/src/lib.rs:211-229)."""

import pytest

from zerochain_tpu.runtime import scale
from zerochain_tpu.runtime.chain import Extrinsic
from zerochain_tpu.runtime.primitives import (
    EncKey,
    LeftCiphertext,
    Nonce,
    ProofBytes,
    RightCiphertext,
    SigVerificationKey,
)


# hand-computed SCALE compact vectors
COMPACT_VECTORS = [
    (0, b"\x00"),
    (1, b"\x04"),
    (42, b"\xa8"),
    (63, b"\xfc"),
    (64, b"\x01\x01"),
    (69, b"\x15\x01"),
    (16383, b"\xfd\xff"),
    (16384, b"\x02\x00\x01\x00"),
    ((1 << 30) - 1, b"\xfe\xff\xff\xff"),
    (1 << 30, b"\x03\x00\x00\x00\x40"),
    ((1 << 32) - 1, b"\x03\xff\xff\xff\xff"),
    (1 << 32, b"\x07\x00\x00\x00\x00\x01"),
]


@pytest.mark.parametrize("value,encoding", COMPACT_VECTORS)
def test_compact_vectors(value, encoding):
    assert scale.compact_encode(value) == encoding
    decoded, offset = scale.compact_decode(encoding)
    assert decoded == value and offset == len(encoding)


def test_fixed_hash_and_vec_encodings():
    """EncKey/H256 = raw bytes; Ciphertext (64B Vec<u8>) = 0x0101 ++ bytes;
    Proof (192B Vec<u8>) = 0x0103 ++ bytes — hand-computed."""
    ek = bytes(range(32))
    assert scale._encode_arg("h256", EncKey(ek)) == ek

    ct = bytes(64)
    assert scale.encode_bytes(ct) == b"\x01\x01" + ct  # compact(64)=0x0101

    proof = bytes(192)
    assert scale.encode_bytes(proof) == b"\x01\x03" + proof  # compact(192)


def test_call_encoding_confidential_transfer():
    args = dict(
        zkproof=ProofBytes(b"\xaa" * 192),
        address_sender=EncKey(b"\x01" * 32),
        address_recipient=EncKey(b"\x02" * 32),
        amount_sender=LeftCiphertext(b"\x03" * 32),
        amount_recipient=LeftCiphertext(b"\x04" * 32),
        fee_sender=LeftCiphertext(b"\x05" * 32),
        randomness=RightCiphertext(b"\x06" * 32),
        nonce=Nonce(b"\x07" * 32),
    )
    enc = scale.encode_call("encrypted_balances", "confidential_transfer",
                            args)
    # module 0, call 0, Vec<u8> proof with compact(192) prefix, then 7 H256s
    expected = (b"\x00\x00" + b"\x01\x03" + b"\xaa" * 192
                + b"\x01" * 32 + b"\x02" * 32 + b"\x03" * 32 + b"\x04" * 32
                + b"\x05" * 32 + b"\x06" * 32 + b"\x07" * 32)
    assert enc == expected

    module, method, decoded = scale.decode_call(enc)
    assert (module, method) == ("encrypted_balances", "confidential_transfer")
    assert decoded["zkproof"] == b"\xaa" * 192
    assert decoded["nonce"] == b"\x07" * 32


def test_signing_payload_layout():
    call = b"\x00\x00" + b"\x01"  # arbitrary
    genesis = b"\x10" * 32
    payload = scale.signing_payload(5, call, genesis)
    assert payload == b"\x14" + call + b"\x00" + genesis  # compact(5)=0x14
    assert scale.signing_message(5, call, genesis) == scale.blake2_256(payload)


def test_extrinsic_sign_encode_decode_roundtrip():
    from zerochain_tpu.mirror import jubjub as jj
    from zerochain_tpu.protocol import redjubjub as rj

    rsk = 12345
    rvk_point = jj.mul(jj.generator(jj.NOTE_COMMITMENT_RANDOMNESS), rsk)
    rvk = SigVerificationKey(jj.to_bytes(rvk_point))

    args = dict(
        zkproof=ProofBytes(b"\x11" * 192),
        address_sender=EncKey(b"\x01" * 32),
        address_recipient=EncKey(b"\x02" * 32),
        amount_sender=LeftCiphertext(b"\x03" * 32),
        amount_recipient=LeftCiphertext(b"\x04" * 32),
        fee_sender=LeftCiphertext(b"\x05" * 32),
        randomness=RightCiphertext(b"\x06" * 32),
        nonce=Nonce(b"\x07" * 32),
    )
    xt = Extrinsic("encrypted_balances", "confidential_transfer", args,
                   rvk, nonce_index=3).sign(rsk, t=b"\x09" * 80)

    wire = xt.encode()
    # substrate-1.0 layout: compact(len) ++ 0x81 ++ 0xff ++ signer ++ sig64
    total, off = scale.compact_decode(wire)
    assert len(wire) - off == total
    assert wire[off] == 0x81
    assert wire[off + 1] == 0xFF
    assert wire[off + 2:off + 34] == rvk.data

    back = Extrinsic.decode(wire)
    assert back.module == "encrypted_balances"
    assert back.method == "confidential_transfer"
    assert back.nonce_index == 3
    assert back.rvk.data == rvk.data
    assert back.args["zkproof"].data == b"\x11" * 192
    assert back.payload() == xt.payload()
    # decoded signature verifies against the SCALE signing message
    vk = rj.PublicKey(jj.from_bytes(rvk.data))
    assert vk.verify(back.payload(), back.signature,
                     base_index=jj.NOTE_COMMITMENT_RANDOMNESS)


def test_anonymous_transfer_call_roundtrip():
    args = dict(
        zkproof=ProofBytes(b"\x22" * 192),
        enc_keys=[EncKey(bytes([i]) * 32) for i in range(12)],
        left_ciphertexts=[LeftCiphertext(bytes([i + 100]) * 32)
                          for i in range(12)],
        right_ciphertext=RightCiphertext(b"\x63" * 32),
        nonce=Nonce(b"\x64" * 32),
    )
    enc = scale.encode_call("anonymous_balances", "anonymous_transfer", args)
    assert enc[:2] == b"\x02\x00"
    # Vec<EncKey> prefix: compact(12) = 12<<2 = 0x30
    assert enc[2 + 2 + 192:2 + 2 + 192 + 1] == b"\x30"
    module, method, decoded = scale.decode_call(enc)
    assert (module, method) == ("anonymous_balances", "anonymous_transfer")
    assert len(decoded["enc_keys"]) == 12
    assert decoded["enc_keys"][5] == bytes([5]) * 32
