"""Wallet stack: HD derivation laws, keystore round trips, SS58."""

import pytest

from zerochain_tpu.wallet.crypto import aes_128_ctr, keccak256
from zerochain_tpu.wallet.derive import (
    ChildIndex,
    ExtendedProofGenerationKey,
    ExtendedSpendingKey,
)
from zerochain_tpu.wallet.keystore import KeystoreError, KeyFile, Wallet
from zerochain_tpu.wallet.ss58 import decode_ss58, encode_ss58


def test_keccak_vectors():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # cross rate boundary
    assert keccak256(b"x" * 200) == keccak256(b"x" * 200)


def test_hd_derivation_commutes():
    """xpgk(child(xsk)) == child(xpgk) for non-hardened (derive/mod.rs test)."""
    seed = b"a seed for hd derivation tests!!"
    xsk = ExtendedSpendingKey.master(seed)
    xpgk = ExtendedProofGenerationKey.master(seed)

    i3 = ChildIndex.non_hardened(3)
    assert (
        ExtendedProofGenerationKey.from_xsk(xsk.derive_child(i3))
        == xpgk.derive_child(i3)
    )

    # hardened from xpgk must fail; via xsk then non-hardened commutes
    h3 = ChildIndex.hardened_(3)
    with pytest.raises(ValueError):
        xpgk.derive_child(h3)
    xsk_h3 = xsk.derive_child(h3)
    xpgk_h3 = ExtendedProofGenerationKey.from_xsk(xsk_h3)
    n5 = ChildIndex.non_hardened(5)
    assert (
        ExtendedProofGenerationKey.from_xsk(xsk_h3.derive_child(n5))
        == xpgk_h3.derive_child(n5)
    )


def test_hd_serialization_roundtrip():
    xsk = ExtendedSpendingKey.master(b"roundtrip seed")
    child = xsk.derive_child(ChildIndex.hardened_(1))
    assert ExtendedSpendingKey.from_bytes(child.to_bytes()) == child
    xpgk = ExtendedProofGenerationKey.from_xsk(child)
    assert ExtendedProofGenerationKey.from_bytes(xpgk.to_bytes()) == xpgk


def test_keyfile_encrypt_decrypt():
    xsk = ExtendedSpendingKey.master(b"keyfile test seed")
    kf = KeyFile.create("acct", b"hunter2", xsk, iterations=64)
    assert kf.decrypt(b"hunter2") == xsk
    with pytest.raises(KeystoreError):
        kf.decrypt(b"wrong")
    kf2 = KeyFile.from_json(kf.to_json())
    assert kf2.decrypt(b"hunter2") == xsk


def test_wallet_lifecycle(tmp_path):
    w = Wallet(tmp_path / "w1")
    phrase = w.init(b"pw", seed=b"deterministic wallet seed 123456",
                    iterations=64)
    # recovery phrase is a valid 12-word BIP39 mnemonic derived from the
    # first 16 bytes of the supplied seed entropy
    from zerochain_tpu.wallet import bip39

    assert len(phrase.split()) == 12
    assert bip39.validate(phrase)
    assert bip39.mnemonic_to_entropy(phrase) == \
        b"deterministic wallet seed 123456"[:16]
    addr1 = w.add_account("alice", b"pw", iterations=64)
    addr2 = w.add_account("bob", b"pw", iterations=64)
    assert addr1 != addr2
    accounts = w.list_accounts()
    assert [a["name"] for a in accounts] == ["default", "alice", "bob"]
    assert accounts[0]["default"]
    w.change_account("bob")
    assert w.default_account() == "bob"
    sk = w.spending_key(b"pw", "alice")

    # recovery reproduces the same keys
    w2 = Wallet(tmp_path / "w2")
    w2.recover(b"other-pw", phrase, iterations=64)
    w2.add_account("alice", b"other-pw", iterations=64)
    assert w2.spending_key(b"other-pw", "alice") == sk

    with pytest.raises(KeystoreError):
        w.init(b"pw")  # already initialized


def test_ss58_roundtrip():
    key = bytes(range(32))
    addr = encode_ss58(key)
    assert decode_ss58(addr) == key
    with pytest.raises(ValueError):
        decode_ss58(addr[:-1] + ("1" if addr[-1] != "1" else "2"))


# ---------------------------------------------------------------------------
# BIP39 (vendored English wordlist; reference wallet uses the bip39 crate,
# zface/src/wallet/commands.rs:29-37)
# ---------------------------------------------------------------------------

# published trezor BIP39 test vectors (entropy -> English mnemonic)
BIP39_VECTORS = [
    ("00000000000000000000000000000000",
     "abandon abandon abandon abandon abandon abandon abandon abandon "
     "abandon abandon abandon about"),
    ("7f7f7f7f7f7f7f7f7f7f7f7f7f7f7f7f",
     "legal winner thank year wave sausage worth useful legal winner "
     "thank yellow"),
    ("80808080808080808080808080808080",
     "letter advice cage absurd amount doctor acoustic avoid letter "
     "advice cage above"),
    ("ffffffffffffffffffffffffffffffff",
     "zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo wrong"),
    ("9e885d952ad362caeb4efe34a8e91bd2",
     "ozone drill grab fiber curtain grace pudding thank cruise elder "
     "eight picnic"),
    ("23db8160a31d3e0dca3688ed941adbf3",
     "cat swing flag economy stadium alone churn speed unique patch "
     "report train"),
    ("f30f8c1da665478f49b001d94c5fc452",
     "vessel ladder alter error federal sibling chat ability sun glass "
     "valve picture"),
]


def test_bip39_wordlist_structure():
    from zerochain_tpu.wallet.bip39_words import WORDLIST

    assert len(WORDLIST) == 2048
    assert list(WORDLIST) == sorted(WORDLIST)
    assert len({w[:4] for w in WORDLIST}) == 2048  # unique 4-char prefixes


def test_bip39_trezor_vectors():
    from zerochain_tpu.wallet import bip39

    for ent_hex, phrase in BIP39_VECTORS:
        assert bip39.entropy_to_mnemonic(bytes.fromhex(ent_hex)) == phrase
        assert bip39.mnemonic_to_entropy(phrase).hex() == ent_hex
    # published seed for the all-zero vector with passphrase "TREZOR"
    seed = bip39.to_seed(BIP39_VECTORS[0][1], "TREZOR")
    assert seed.hex().startswith("c55257c360c07c72029aebc1b53c05ed")


def test_bip39_checksum_rejection():
    import pytest

    from zerochain_tpu.wallet import bip39

    good = BIP39_VECTORS[4][1].split()
    bad = " ".join(good[:-1] + ["abandon"])  # breaks the checksum
    assert not bip39.validate(bad)
    with pytest.raises(bip39.MnemonicError):
        bip39.mnemonic_to_entropy(bad)
    with pytest.raises(bip39.MnemonicError):
        bip39.mnemonic_to_entropy("definitely notaword " * 6)


def test_wallet_recover_from_mnemonic(tmp_path):
    from zerochain_tpu.wallet import bip39

    w = Wallet(tmp_path / "m1")
    phrase = w.init(b"pw", iterations=64)
    assert bip39.validate(phrase)
    sk = w.spending_key(b"pw", "default")

    w2 = Wallet(tmp_path / "m2")
    w2.recover(b"pw2", phrase, iterations=64)
    assert w2.spending_key(b"pw2", "default") == sk
