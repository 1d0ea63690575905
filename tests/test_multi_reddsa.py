"""Multi-party RedDSA: 3-round signing, aggregate verification, misuse."""

import pytest

from zerochain_tpu.mirror import jubjub as jj
from zerochain_tpu.mirror.field import S
from zerochain_tpu.protocol.multi_reddsa import (
    CommitmentStage,
    MRPubkey,
    MultiSigError,
    SignerKeys,
    DEFAULT_BASE,
)


def _sign(msg, secrets, signer_keys, tweak=None):
    stages = [
        CommitmentStage(msg, x, signer_keys, i, t=bytes([i]) * 80)
        for i, x in enumerate(secrets)
    ]
    comms = [s.commitment for s in stages]
    reveal_stages = [s.commit(comms) for s in stages]
    reveals = [s.R_i for s in reveal_stages]
    share_pairs = [s.reveal(reveals) for s in reveal_stages]
    shares = [sh for _, sh in share_pairs]
    if tweak is not None:
        shares[tweak] = (shares[tweak] + 1) % S
    sigs = [st.share(shares) for st, _ in share_pairs]
    for s in sigs[1:]:
        assert s == sigs[0]
    return sigs[0]


@pytest.fixture(scope="module")
def setup():
    secrets = [11, 22, 33]
    g = jj.generator(DEFAULT_BASE)
    pub_keys = tuple(jj.mul(g, x) for x in secrets)
    keys = SignerKeys(pub_keys)
    return secrets, keys


def test_three_party_signature(setup):
    secrets, keys = setup
    msg = b"multi-sig message"
    sig = _sign(msg, secrets, keys)
    agg = MRPubkey(keys.agg_pub_key())
    assert agg.verify(msg, sig)
    assert not agg.verify(b"other message", sig)


def test_bad_share_rejected(setup):
    secrets, keys = setup
    with pytest.raises(MultiSigError):
        _sign(b"msg", secrets, keys, tweak=1)


def test_commitment_mismatch_rejected(setup):
    secrets, keys = setup
    msg = b"msg"
    stages = [
        CommitmentStage(msg, x, keys, i, t=bytes([i]) * 80)
        for i, x in enumerate(secrets)
    ]
    comms = [s.commitment for s in stages]
    rs = [s.commit(comms) for s in stages]
    reveals = [s.R_i for s in rs]
    reveals[2] = jj.mul(jj.generator(DEFAULT_BASE), 999)  # lie in reveal
    with pytest.raises(MultiSigError):
        rs[0].reveal(reveals)
