"""Native C codec vs Python semantics (and its NumPy fallback)."""

import random

import numpy as np
import pytest

from zerochain_tpu.native import codec


@pytest.fixture(scope="module")
def vals():
    rng = random.Random(123)
    return [rng.randrange(1 << 255) for _ in range(300)] + [
        0, 1, (1 << 255) - 1, 0xFFF, 1 << 252,
    ]


def test_bits_roundtrip(vals):
    bits = codec.scalars_to_bits_np(vals, 255)
    assert bits.shape == (255, len(vals))
    for j in (0, 5, 300, 303, 304):
        v = sum(int(bits[i, j]) << i for i in range(255))
        assert v == vals[j]


def test_limbs_roundtrip(vals):
    limbs = codec.scalars_to_limbs_np(vals, 22)
    assert limbs.shape == (22, len(vals))
    assert codec.limbs_to_scalars(limbs) == vals


def test_fallback_matches_native(vals, monkeypatch):
    if not codec.native_available():
        pytest.skip("no native lib")
    native_bits = codec.scalars_to_bits_np(vals, 255)
    native_limbs = codec.scalars_to_limbs_np(vals, 22)
    monkeypatch.setattr(codec, "_lib", False)
    assert (codec.scalars_to_bits_np(vals, 255) == native_bits).all()
    assert (codec.scalars_to_limbs_np(vals, 22) == native_limbs).all()
    assert codec.limbs_to_scalars(native_limbs) == vals
