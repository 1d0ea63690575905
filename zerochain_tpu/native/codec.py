"""ctypes loader + NumPy fallback for the native codec (codec.c).

Builds `libzc_codec.so` with cc on first import (cached beside the
source); every entry point has a pure-NumPy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_HERE = pathlib.Path(__file__).parent
_SO = _HERE / "libzc_codec.so"
_SRC = _HERE / "codec.c"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(str(_SO))
        for name, args in [
            ("scalars_to_bits",
             [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]),
            ("scalars_to_limbs",
             [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]),
            ("limbs_to_scalars",
             [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]),
        ]:
            fn = getattr(lib, name)
            fn.argtypes = args
            fn.restype = None
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def native_available() -> bool:
    return bool(_load())


def _scalar_bytes(scalars: list[int]) -> np.ndarray:
    buf = np.empty((len(scalars), 32), dtype=np.uint8)
    for j, s in enumerate(scalars):
        buf[j] = np.frombuffer(s.to_bytes(32, "little"), dtype=np.uint8)
    return buf


def scalars_to_bits_np(scalars: list[int], n_bits: int = 255) -> np.ndarray:
    """ints -> (n_bits, N) int32 LE bit planes."""
    n = len(scalars)
    lib = _load()
    if lib:
        sb = np.ascontiguousarray(_scalar_bytes(scalars))
        out = np.empty((n_bits, n), dtype=np.int32)
        lib.scalars_to_bits(
            sb.ctypes.data, n, n_bits, out.ctypes.data
        )
        return out
    # NumPy fallback: unpack bits from the byte matrix
    sb = _scalar_bytes(scalars)  # (N, 32)
    bits = np.unpackbits(sb, axis=1, bitorder="little")  # (N, 256)
    out = np.zeros((n_bits, n), dtype=np.int32)
    take = min(n_bits, 256)
    out[:take] = bits[:, :take].T
    return out


def scalars_to_limbs_np(scalars: list[int], n_limbs: int) -> np.ndarray:
    """ints -> (n_limbs, N) int32 12-bit limb planes."""
    n = len(scalars)
    lib = _load()
    if lib:
        sb = np.ascontiguousarray(_scalar_bytes(scalars))
        out = np.empty((n_limbs, n), dtype=np.int32)
        lib.scalars_to_limbs(sb.ctypes.data, n, n_limbs, out.ctypes.data)
        return out
    out = np.zeros((n_limbs, n), dtype=np.int32)
    for j, s in enumerate(scalars):
        for l in range(n_limbs):
            out[l, j] = (s >> (12 * l)) & 0xFFF
    return out


def limbs_to_scalars(limbs: np.ndarray) -> list[int]:
    """(n_limbs, N) canonical int32 limb planes -> ints (≤ 256 bits)."""
    n_limbs, n = limbs.shape
    lib = _load()
    if lib:
        ll = np.ascontiguousarray(limbs, dtype=np.int32)
        out = np.empty((n, 32), dtype=np.uint8)
        lib.limbs_to_scalars(ll.ctypes.data, n, n_limbs, out.ctypes.data)
        return [int.from_bytes(row.tobytes(), "little") for row in out]
    vals = []
    for j in range(n):
        v = 0
        for l in range(n_limbs - 1, -1, -1):
            v = (v << 12) | int(limbs[l, j])
        vals.append(v)
    return vals
