"""Batched radix-2 NTT over Fr limb arrays.

Replaces the bellman fork's multicore radix-2 FFT (SURVEY.md §2.3) with a
bit-sliced TPU design: elements are (22, ..., N) 12-bit-limb arrays, each
butterfly stage is one fully batched Montgomery multiply + add/sub over the
whole (batch, N/2) plane, twiddles are precomputed per stage on the host.
Fr's 2-adicity S = 32 (fr.rs:47) allows sizes up to 2^32; plans are cached
per size.  Oracle: groth16/domain.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import limbs as L
from ..groth16 import domain as dom
from ..mirror.field import R, FR_GENERATOR, fr_inv

FR = L.FR


def _to_mont_np(vals):
    """ints -> (22, len) numpy limb array in Montgomery form."""
    arr = np.zeros((FR.n, len(vals)), dtype=np.int32)
    for j, v in enumerate(vals):
        arr[:, j] = L._int_to_limbs(v * FR.r_mod_p % R, FR.n)
    return arr


class NttPlan:
    """Precomputed tables for one power-of-two size d."""

    def __init__(self, d: int):
        assert d & (d - 1) == 0
        self.d = d
        self.lg = d.bit_length() - 1
        omega = dom.omega_for(d)
        omega_inv = fr_inv(omega)

        # bit-reversal permutation
        idx = np.arange(d)
        rev = np.zeros(d, dtype=np.int32)
        for b in range(self.lg):
            rev |= ((idx >> b) & 1) << (self.lg - 1 - b)
        self.bitrev = rev

        # per-stage twiddles: stage s has half-size m = 2^s, twiddles
        # w_m^l = omega^(d/(2m) * l) for l in 0..m-1
        def stage_twiddles(w):
            out = []
            for s in range(self.lg):
                m = 1 << s
                base = pow(w, self.d // (2 * m), R)
                tw = []
                cur = 1
                for _ in range(m):
                    tw.append(cur)
                    cur = cur * base % R
                out.append(_to_mont_np(tw))
            return out

        self.twiddles = stage_twiddles(omega)
        self.twiddles_inv = stage_twiddles(omega_inv)

        self.n_inv = _to_mont_np([fr_inv(d)])[:, 0]

        # coset scaling vectors (Montgomery): g^i and g^{-i}
        g = FR_GENERATOR
        ginv = fr_inv(g)

        def powers(base):
            out, cur = [], 1
            for _ in range(d):
                out.append(cur)
                cur = cur * base % R
            return _to_mont_np(out)

        self.coset = powers(g)
        self.coset_inv = powers(ginv)
        # 1 / z(coset) = 1 / (g^d - 1), Montgomery
        self.zinv = _to_mont_np([fr_inv((pow(g, d, R) - 1) % R)])[:, 0]

        # jitted entry points (eager limb math is pathological)
        self.ntt = jax.jit(self._ntt)
        self.intt = jax.jit(self._intt)
        self.coset_ntt = jax.jit(self._coset_ntt)
        self.icoset_ntt = jax.jit(self._icoset_ntt)
        self.divide_by_z_on_coset = jax.jit(self._divide_by_z_on_coset)

    # -- core transforms (operate on last axis; limb axis 0) ----------
    def _fft(self, a, twiddles):
        d = self.d
        a = jnp.take(a, self.bitrev, axis=-1)
        batch = a.shape[1:-1]
        for s in range(self.lg):
            m = 1 << s
            nb = d // (2 * m)
            a = a.reshape(FR.n, *batch, nb, 2, m)
            even = a[..., 0, :]
            odd = a[..., 1, :]
            tw = twiddles[s].reshape(
                (FR.n,) + (1,) * (len(batch) + 1) + (m,)
            )
            t = L.mont_mul(FR, odd, jnp.broadcast_to(tw, odd.shape))
            a = jnp.stack(
                [L.add(FR, even, t), L.sub(FR, even, t)], axis=-2
            )
            # interleave blocks: (nb, 2, m) -> (nb, 2m) with stride order
            a = a.reshape(FR.n, *batch, nb, 2 * m)
        return a.reshape(FR.n, *batch, d)

    def _ntt(self, a):
        return self._fft(a, self.twiddles)

    def _intt(self, a):
        out = self._fft(a, self.twiddles_inv)
        ninv = self.n_inv.reshape((FR.n,) + (1,) * (out.ndim - 1))
        return L.mont_mul(FR, out, jnp.broadcast_to(ninv, out.shape))

    def _scale(self, a, vec):
        v = vec.reshape((FR.n,) + (1,) * (a.ndim - 2) + (self.d,))
        return L.mont_mul(FR, a, jnp.broadcast_to(v, a.shape))

    def _coset_ntt(self, coeffs):
        return self._ntt(self._scale(coeffs, self.coset))

    def _icoset_ntt(self, evals):
        return self._scale(self._intt(evals), self.coset_inv)

    def _divide_by_z_on_coset(self, evals):
        z = self.zinv.reshape((FR.n,) + (1,) * (evals.ndim - 1))
        return L.mont_mul(FR, evals, jnp.broadcast_to(z, evals.shape))


_PLANS: dict[int, NttPlan] = {}


def plan_for(d: int) -> NttPlan:
    if d not in _PLANS:
        _PLANS[d] = NttPlan(d)
    return _PLANS[d]
