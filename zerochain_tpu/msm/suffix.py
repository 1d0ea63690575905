"""Suffix-sum Pippenger MSM: sort + one work-efficient prefix scan.

The round-2 MSM (msm/pippenger.py) bucket-accumulated each window with a
Hillis-Steele segmented scan: N*log2(N) point-adds per window, each level a
full-width HBM round trip, followed by a 2^c-step sequential bucket fold
and a 255-doubling window combine PER CHUNK.  This module replaces all of
that with the suffix-sum identity

    sum_i d_i * P_i  =  sum_{t=1}^{2^c - 1}  sum_{i : d_i >= t} P_i

With points sorted by digit (descending), every inner sum is a PREFIX of
the sorted array, so one inclusive prefix scan (Ladner-Fischer, ~2N adds,
work-efficient and fully vectorized over windows x proof batch) plus a
2^c-point gather + tree-sum replaces the segmented scan, the bucket
scatter, and the bucket fold.  No scatter of point data anywhere; the only
data-dependent addressing is an int32 histogram and a small gather.

Per-window totals are returned separately so the chunk loop accumulates
partials per window and the Horner window combine (c doublings per window,
reference semantics = bellman's multiexp recombination, SURVEY.md §2.3)
runs ONCE per MSM instead of once per chunk.

Work per (window, proof): sort N int32 keys + ~2N point-adds + 2^c-gather
+ 2^c adds.  The reference's bellman fork does the same sum with scalar
bucket adds fanned over CPU threads; none of that maps to the VPU — this
does, riding the fused Pallas group-law kernels (ec/pallas_ec.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import weierstrass as W
from ..ec.fields import FqOps, Fq2Ops
from ..ff import limbs as L
from .pippenger import tmap, WINDOW_C

LIMB_BITS = L.LIMB_BITS


def digits_from_limbs(limbs: jnp.ndarray, c: int, n_windows: int):
    """(n_limbs, ...) canonical 12-bit limb scalars -> (nw, ...) c-bit digits.

    Skips the (255, N, B) bit expansion of pippenger.limbs_to_bits: each
    c-bit window straddles at most two 12-bit limbs (c <= 12)."""
    assert c <= LIMB_BITS
    z = jnp.zeros((1, *limbs.shape[1:]), limbs.dtype)
    ext = jnp.concatenate([limbs, z], axis=0)
    mask = (1 << c) - 1
    outs = []
    for w in range(n_windows):
        l0, s0 = divmod(c * w, LIMB_BITS)
        d = ext[min(l0, ext.shape[0] - 1)] >> s0
        if LIMB_BITS - s0 < c and l0 + 1 < ext.shape[0]:
            d = d | (ext[l0 + 1] << (LIMB_BITS - s0))
        outs.append(d & mask)
    return jnp.stack(outs, axis=0)


def signed_digits_from_limbs(limbs: jnp.ndarray, c: int, n_windows: int):
    """Canonical limb scalars -> SIGNED c-bit digits in [-(2^(c-1)-1),
    2^(c-1)] via the standard borrow chain (digit > 2^(c-1) -> subtract
    2^c, carry 1 into the next window).

    Halves the bucket count of the suffix MSM (|digit| <= 2^(c-1), the
    point sign is applied by negating Y — free on a Weierstrass curve),
    which halves the one-hot gather rows of the single-kernel tail
    (pallas_scan._totals_kernel phase C).  Requires c*n_windows > n_bits
    of the scalars so the top window cannot carry out (255-bit Fr scalars
    at c=8, nw=32: top raw digit <= 127, +carry <= 128 = 2^(c-1))."""
    raw = digits_from_limbs(limbs, c, n_windows)
    half = 1 << (c - 1)
    outs = []
    carry = jnp.zeros_like(raw[0])
    for w in range(n_windows):
        v = raw[w] + carry
        wrap = v > half
        outs.append(jnp.where(wrap, v - (1 << c), v))
        carry = wrap.astype(raw.dtype)
    return jnp.stack(outs, axis=0)


def _neg_y_where(F, pts, mask):
    """Negate the Y coordinate of Jacobian points where mask (bool,
    batch-shaped) holds: (x, -y, z) is the Weierstrass negation and
    encodes a subtracted point for signed-digit windows."""
    x, y, z = pts
    ny = W.neg(F, (x, y, z))[1]
    if F.name == "fq":
        return (x, jnp.where(mask, ny, y), z)
    return (
        x,
        tuple(jnp.where(mask, a, b) for a, b in zip(ny, y)),
        z,
    )


def _interleave(a, b):
    """(..., n), (..., n) -> (..., 2n) with a at even, b at odd slots."""
    stacked = jnp.stack([a, b], axis=-1)
    return stacked.reshape(*a.shape[:-1], 2 * a.shape[-1])


LF_MIN = int(os.environ.get("ZEROCHAIN_LF_MIN", "256"))


def lf_scan(F, pts):
    """Inclusive prefix scan (group add) along the LAST axis (pow2 width).

    Ladner-Fischer: pairwise-combine, recurse on halves, reconstruct —
    ~2N adds total (work-efficient) at 2*log2(N) add-depth, every level a
    single vectorized fused-kernel add over the full (window x proof)
    batch.  Below LF_MIN the recursion switches to the lax.scan HS twin:
    the narrow tail levels contribute negligible runtime but each unrolled
    add inlines a multi-k-eqn composed graph once the width drops under
    the Pallas routing threshold — XLA took tens of minutes on the G2
    module before this cut."""
    n = jax.tree_util.tree_leaves(pts)[0].shape[-1]
    if n == 1:
        return pts
    if n <= LF_MIN:
        return hs_prefix_scan(F, pts)
    assert n % 2 == 0, "lf_scan needs a pow2 width"
    even = tmap(lambda x: x[..., 0::2], pts)
    odd = tmap(lambda x: x[..., 1::2], pts)
    s = W.add(F, even, odd)          # pair sums           (n/2 adds)
    r = lf_scan(F, s)                # inclusive scan of pair sums
    batch = jax.tree_util.tree_leaves(pts)[0].shape[:-1]
    ident = W.identity(F, (*batch[1:], 1))
    r_prev = jax.tree.map(
        lambda x, i: jnp.concatenate(
            [jnp.broadcast_to(i, (*x.shape[:-1], 1)), x[..., :-1]], axis=-1
        ),
        r, ident,
    )
    y_even = W.add(F, r_prev, even)  # odd-position fix-up (n/2 adds)
    return jax.tree.map(_interleave, y_even, r)


def hs_prefix_scan(F, pts):
    """Inclusive prefix scan as a lax.scan over shift distances.

    N*log2(N) adds but ONE point-add instance (constant shapes), so the
    XLA module stays tiny — the right trade when the fused Pallas kernels
    are not in play (CPU test suite, tiny widths), where lf_scan's
    unrolled shrinking-width adds each inline a ~3.5k-eqn composed graph
    and XLA:CPU's LLVM takes minutes per module."""
    n = jax.tree_util.tree_leaves(pts)[0].shape[-1]
    if n == 1:
        return pts
    n_levels = (n - 1).bit_length()
    shifts = jnp.asarray([1 << d for d in range(n_levels)], jnp.int32)
    pos = jax.lax.iota(jnp.int32, n)

    def level(x, s):
        shifted = tmap(lambda a: jnp.roll(a, s, axis=-1), x)
        merged = W.add(F, shifted, x)
        keep = pos < s  # no element at distance s to the left
        return jax.tree.map(
            lambda xc, mc: jnp.where(keep, xc, mc), x, merged
        ), None

    y, _ = jax.lax.scan(level, pts, shifts)
    return y


def prefix_scan(F, pts):
    """Trace-time routing: work-efficient unrolled LF when the fused
    Pallas kernels will run the adds, compile-compact HS otherwise.
    (The MSM itself no longer goes through here on TPU — see the
    column-major pallas path in _group_partials.)"""
    from ..ff import pallas_ff as PF

    leaf = jax.tree_util.tree_leaves(pts)[0]
    if PF.use_pallas(leaf.shape):
        return lf_scan(F, pts)
    return hs_prefix_scan(F, pts)


def exclusive_scan_last(F, pts):
    """Exclusive group prefix scan along the last axis: HS inclusive
    (one add instance via lax.scan) shifted right by one identity."""
    inc = hs_prefix_scan(F, pts)
    batch = jax.tree_util.tree_leaves(pts)[0].shape[:-1]
    ident = W.identity(F, (*batch[1:], 1))
    return jax.tree.map(
        lambda x, i: jnp.concatenate(
            [jnp.broadcast_to(i, (*x.shape[:-1], 1)), x[..., :-1]], axis=-1
        ),
        inc, ident,
    )


def scan_reduce_last(F, pts, n: int):
    """Group-sum over the last axis via circular recursive doubling.

    Pads to a pow2 width with identities, then lax.scans log2(width)
    levels of x += roll(x, s): after the last level EVERY lane holds the
    total (all-reduce pattern), so lane 0 is returned.  One point-add
    instance total — the pairwise tree twin below unrolls log2(width)
    halving-width instances, each embedding its own Mosaic payload when
    the fused kernels are routed (the round-3 compile-time trap)."""
    pad = 1 << max(0, (n - 1).bit_length())
    if pad != n:
        ident = W.identity(F, (pad - n,))

        def extend(x, i):
            i = i.reshape(i.shape[0], *([1] * (x.ndim - 2)), i.shape[-1])
            return jnp.concatenate(
                [x, jnp.broadcast_to(i, (*x.shape[:-1], pad - n))], axis=-1
            )

        pts = jax.tree.map(extend, pts, ident)
    if pad == 1:
        return tmap(lambda x: x[..., 0], pts)
    n_levels = (pad - 1).bit_length()
    shifts = jnp.asarray([1 << d for d in range(n_levels)], jnp.int32)

    def level(x, s):
        shifted = tmap(lambda a: jnp.roll(a, s, axis=-1), x)
        return W.add(F, x, shifted), None

    y, _ = jax.lax.scan(level, pts, shifts)
    return tmap(lambda x: x[..., 0], y)


def tree_sum_last(F, pts, n: int):
    """Pairwise tree reduction over the last axis (n entries)."""
    pad = 1 << max(0, (n - 1).bit_length())
    if pad != n:
        ident = W.identity(F, (pad - n,))

        def extend(x, i):
            # identity leaf (L, pad-n) -> align with (L, ..., pad-n)
            i = i.reshape(i.shape[0], *([1] * (x.ndim - 2)), i.shape[-1])
            return jnp.concatenate(
                [x, jnp.broadcast_to(i, (*x.shape[:-1], pad - n))], axis=-1
            )

        pts = jax.tree.map(extend, pts, ident)
        n = pad
    while n > 1:
        half = n // 2
        a = tmap(lambda x: x[..., :half], pts)
        b = tmap(lambda x: x[..., half:n], pts)
        pts = W.add(F, a, b)
        n = half
    return tmap(lambda x: x[..., 0], pts)


class SuffixMsm:
    """Variable-base MSM over one Weierstrass group via suffix sums.

    ``window_partials(points, digits)`` -> per-window totals (nw, *batch);
    ``combine(totals)`` -> final points (*batch).  Split so a chunked
    caller adds partials across chunks and combines once.

    ``signed=True`` (the prover's mode) uses signed c-bit digits
    (|d| <= 2^(c-1), sign applied by negating Y), halving the bucket
    count — and with it the one-hot gather work and VMEM of the
    single-kernel tail.  Digits must then come from ``self.digits()``
    (signed_digits_from_limbs).  The sort can also be hoisted out via
    ``prep(digits)`` and passed to ``window_partials(points, prep=...)``
    so MSMs over the SAME scalars (the prover's B1 G1 / B2 G2 pair)
    sort once."""

    def __init__(self, field, c: int | None = None, n_bits: int = 255,
                 window_group: int | None = None, signed: bool = False):
        self.F = field
        self.c = WINDOW_C if c is None else c
        self.n_bits = n_bits
        self.signed = signed
        nw = -(-n_bits // self.c)
        if signed and self.c * nw <= n_bits:
            nw += 1  # top window must absorb the final borrow carry
        self.n_windows = nw
        self.nb = ((1 << (self.c - 1)) + 1) if signed else (1 << self.c)
        self.window_group = (
            int(os.environ.get("ZEROCHAIN_MSM_WG", "8"))
            if window_group is None else window_group
        )
        self._jit_partials = jax.jit(self._partials)
        self._jit_partials_pre = jax.jit(self._partials_pre)
        self._jit_prep = jax.jit(self._prep)
        self._jit_combine = jax.jit(self._combine)
        self._jit_full = jax.jit(
            lambda pts, digits: self._combine(self._partials(pts, digits))
        )

    def digits(self, limbs):
        """Canonical limb scalars (n_limbs, ...) -> digit array
        (nw, ...) in this MSM's digit encoding."""
        if self.signed:
            return signed_digits_from_limbs(limbs, self.c, self.n_windows)
        return digits_from_limbs(limbs, self.c, self.n_windows)

    # ------------------------------------------------------------------
    def _prep(self, digits):
        """digits (nw, N, *batch) -> (sorted_digits, order), both
        (nw, *batch, N) int32, ordered by |digit| DESCENDING (logical
        order).  Separate from the scan so callers sharing scalars
        across MSMs (B1/B2) pay the sort once."""
        digits_m = jnp.moveaxis(digits, 1, -1)  # (nw, *batch, N)
        N = digits_m.shape[-1]
        mag = jnp.abs(digits_m) if self.signed else digits_m
        nbits_idx = (N - 1).bit_length()
        iota = jnp.broadcast_to(jax.lax.iota(jnp.int32, N), digits_m.shape)
        # pack (|digit|, index) into ONE int32 key: a single-array sort
        # moves half the data of the (key, payload) pair sort — measured
        # 154 ms -> ~80 ms per (8, 32, 8192) group-step.  |digit| < 2^c
        # (c <= 12) and index < 2^13 fit 25 bits.
        if self.c + nbits_idx > 31:  # packed key would overflow int32
            _, order = jax.lax.sort((mag, iota), dimension=-1, num_keys=1)
            order = order[..., ::-1]
        else:
            packed = (mag << nbits_idx) | iota
            packed_asc = jax.lax.sort(packed, dimension=-1)
            order = (packed_asc & ((1 << nbits_idx) - 1))[..., ::-1]
        sorted_digits = jnp.take_along_axis(digits_m, order, axis=-1)
        return sorted_digits, order

    def _group_partials(self, points, sorted_digits, order):
        """points: leaves (L, N); sorted_digits/order: (g, *batch, N)
        (|digit| descending) -> totals (g, *batch)."""
        from ..ff import pallas_ff as PF
        from . import pallas_scan as PS

        F = self.F
        N = order.shape[-1]
        lead = order.shape[:-1]

        use_cm = (
            PF.use_pallas(points[0].shape if F.name == "fq"
                          else points[0][0].shape)
            and N % PS.VL == 0
            and (N & (N - 1)) == 0
            and self.nb - 1 <= PS.VL
            and not int(os.environ.get("ZEROCHAIN_SCAN_UNROLLED", "0"))
        )
        if use_cm and int(os.environ.get("ZEROCHAIN_MSM_TOTALS", "1")):
            # the whole suffix tail in ONE pallas kernel
            # (pallas_scan.window_totals) — depth scan, bucket counts,
            # virtual-lane exclusive scan, one-hot MXU gather, bucket
            # reduce — no XLA gathers (measured ~100 ms of stray HBM
            # reads per group-step) and no searchsorted (~90 ms).
            # Sign application (negate Y) happens in-kernel from the
            # sorted digit planes.
            perm = PS.phys_perm(N)
            phys_order = jnp.take(order, perm, axis=-1)
            sd_cm = jnp.take(sorted_digits, perm, axis=-1)
            pts_cm = tmap(
                lambda a: jnp.take(a, phys_order, axis=-1), points
            )
            return PS.window_totals(F, pts_cm, sd_cm, self.nb,
                                    signed=self.signed)

        # cnt_ge[t] = #{i : |d_i| >= t} via searchsorted on the ascending
        # magnitudes.  NB: no histogram scatter here — real witness
        # digits are heavily skewed (thousands of zeros), and a
        # scatter-add with colliding indices serializes per duplicate on
        # TPU (measured: 10-30x slow-down vs uniform-random digits).
        mag_desc = (jnp.abs(sorted_digits) if self.signed
                    else sorted_digits)
        asc = mag_desc[..., ::-1]
        ts = jnp.arange(1, self.nb, dtype=asc.dtype)
        pos = jax.vmap(
            lambda row: jnp.searchsorted(row, ts, side="left")
        )(asc.reshape(-1, N))
        cnt = (N - pos).reshape(*lead, self.nb - 1).astype(jnp.int32)
        idx = jnp.maximum(cnt - 1, 0)
        empty = cnt == 0

        if use_cm:
            perm = PS.phys_perm(N)
            phys_order = jnp.take(order, perm, axis=-1)
            pts_cm = tmap(
                lambda a: jnp.take(a, phys_order, axis=-1), points
            )
            if self.signed:
                neg_cm = jnp.take(sorted_digits < 0, perm, axis=-1)
                pts_cm = _neg_y_where(F, pts_cm, neg_cm)
            # split fallback: in-VMEM depth-scan kernel + XLA tail
            t_depth = N // PS.VL
            if t_depth > 1:
                pre = PS.column_scan(F, pts_cm)
            else:
                pre = pts_cm
            tot = tmap(lambda a: a[..., (t_depth - 1) * PS.VL :], pre)
            excl = exclusive_scan_last(F, tot)
            jphys = (idx % t_depth) * PS.VL + idx // t_depth
            vl = idx // t_depth

            def gather_at(ix):
                def g(leaf):
                    b = jnp.broadcast_to(
                        ix, leaf.shape[:-1] + ix.shape[-1:]
                    )
                    return jnp.take_along_axis(leaf, b, axis=-1)

                return g

            picked = tmap(gather_at(jphys), pre)
            offs = tmap(gather_at(vl), excl)
            picked = W.add(F, picked, offs)
        else:
            pts_s = tmap(lambda a: jnp.take(a, order, axis=-1), points)
            if self.signed:
                pts_s = _neg_y_where(F, pts_s, sorted_digits < 0)
            pre = prefix_scan(F, pts_s)  # inclusive prefix, sorted pts

            def gather(leaf):
                ix = jnp.broadcast_to(
                    idx, leaf.shape[:-1] + idx.shape[-1:]
                )
                return jnp.take_along_axis(leaf, ix, axis=-1)

            picked = tmap(gather, pre)             # (L, g, *batch, nb-1)

        ident = W.identity(F, empty.shape)
        picked = W.select(F, empty, ident, picked)
        return scan_reduce_last(F, picked, self.nb - 1)

    def _partials(self, points, digits):
        """points: Jacobian leaves (N,); digits (nw, N, *batch) ->
        per-window totals, leaves (nw, *batch) (window axis = leaf axis 1,
        after the limb axis)."""
        sorted_digits, order = self._prep(digits)
        return self._partials_pre(points, sorted_digits, order)

    def _partials_pre(self, points, sorted_digits, order):
        from ..ff import pallas_ff as PF

        with PF.forced():
            return self._partials_body(points, sorted_digits, order)

    def _partials_body(self, points, sorted_digits, order):
        nw = self.n_windows
        assert order.shape[0] == nw, (order.shape, nw)

        # lax.scan over window groups: bounds the sorted-copy HBM temps to
        # one group while tracing the group body once (a python loop would
        # inline nw/wg copies into the XLA module).  wg is rounded down to
        # the balanced split so padding windows stay minimal (nw=26 with
        # wg=8 would pad to 32 — 19% dead sort/scan work).
        wg = max(1, min(self.window_group, nw))
        ng = -(-nw // wg)
        wg = -(-nw // ng)
        if ng * wg != nw:  # pad windows (zero digits: identity totals)
            pad = ng * wg - nw

            def padw(a):
                return jnp.concatenate(
                    [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], axis=0
                )

            sorted_digits = padw(sorted_digits)
            order = padw(order)
        groups_sd = sorted_digits.reshape(ng, wg, *sorted_digits.shape[1:])
        groups_od = order.reshape(ng, wg, *order.shape[1:])

        def body(_, xs):
            sd, od = xs
            return None, self._group_partials(points, sd, od)

        _, totals = jax.lax.scan(body, None, (groups_sd, groups_od))
        # leaves (ng, L, wg, *batch) -> (L, nw, *batch)
        totals = tmap(
            lambda a: jnp.moveaxis(a, 0, 1).reshape(
                a.shape[1], ng * wg, *a.shape[3:]
            )[:, :nw],
            totals,
        )
        return totals

    def _combine(self, totals):
        """Per-window totals (leaves: window axis in front of batch) ->
        final point: Horner MSB-first, c doublings + 1 add per window."""
        from ..ff import pallas_ff as PF

        with PF.forced():
            return self._combine_body(totals)

    def _combine_body(self, totals):
        F = self.F
        nw = self.n_windows

        def comb(res, tw):
            # fori_loop (not an unrolled python loop): ONE double
            # instance in the module instead of c — the unrolled form
            # put 8 copies of the fused-double Mosaic payload in every
            # MSM module (compile cost, round-3 postmortem)
            res = jax.lax.fori_loop(
                0, self.c, lambda _, p: W.double(F, p), res
            )
            return W.add(F, res, tw), None

        init = tmap(lambda a: _index_lead(a, nw - 1), totals)
        if nw == 1:
            return init
        rest = tmap(lambda a: _slice_lead_rev(a, nw), totals)
        res, _ = jax.lax.scan(comb, init, rest)
        return res

    # public API -------------------------------------------------------
    def prep(self, digits):
        """digits (nw, N, *batch) -> (sorted_digits, order) for
        window_partials(..., prep=...).  Hoisting this out lets MSMs over
        the same scalars (B1/B2) share one sort."""
        return self._jit_prep(digits)

    def window_partials(self, points, digits=None, prep=None):
        if prep is not None:
            return self._jit_partials_pre(points, *prep)
        return self._jit_partials(points, digits)

    def combine(self, totals):
        return self._jit_combine(totals)

    def __call__(self, points, digits):
        """points: Jacobian leaves (N,); digits (nw, N, *batch) ->
        Jacobian point leaves (*batch)."""
        return self._jit_full(points, digits)


def _index_lead(a, i):
    # leaves (L, nw, *batch) from _partials: window axis is 1
    return jax.lax.index_in_dim(a, i, axis=1, keepdims=False)


def _slice_lead_rev(a, nw):
    # windows nw-2 .. 0 reversed, moved to axis 0 for lax.scan
    sl = jax.lax.slice_in_dim(a, 0, nw - 1, axis=1)
    return jnp.flip(sl, axis=1).swapaxes(0, 1)
