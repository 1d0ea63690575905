"""Pippenger MSM on TPU: sort-by-bucket + segmented-scan accumulation.

The reference's multiexp (external bellman fork, SURVEY.md §2.3) fans
bucket accumulation across CPU threads with scalar adds; scatter-style
bucket accumulation does not map to TPU vector units, so each window here:

  1. extracts c-bit digits from the scalar bits,
  2. sorts point indices by digit (jnp.argsort),
  3. reduces runs of equal digits with a segmented associative_scan whose
     combine is the branch-free Jacobian add (~2N adds/window),
  4. scatters the per-segment sums into the 2^c bucket table (tiny),
  5. folds buckets with the running-sum trick (one lax.scan),

and windows combine with c doublings + an add each.  The per-window work is
itself a lax.scan so the graph stays compact.  No data-dependent control
flow anywhere.

`FixedBaseMsm` covers the CRS-generation pattern (one base, many scalars)
with a precomputed (n_windows, 2^c) table + gather + log-depth tree add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import weierstrass as W
from ..ec.fields import FqOps, Fq2Ops
from ..ff import limbs as L

FR = L.FR
import os as _os
WINDOW_C = int(_os.environ.get("ZEROCHAIN_MSM_C", "8"))


# -------------------------------------------------------- pytree helpers
def tmap(fn, pt):
    """Map fn over the leaf arrays of a Jacobian/affine point tuple."""
    return tuple(
        tuple(fn(cc) for cc in comp) if isinstance(comp, tuple) else fn(comp)
        for comp in pt
    )


def scalars_to_bits(scalars: list[int], n_bits: int = 255) -> jnp.ndarray:
    """Host ints -> (n_bits, N) LE bit array (native codec)."""
    from ..native.codec import scalars_to_bits_np

    return jnp.asarray(scalars_to_bits_np(list(scalars), n_bits))


def limbs_to_bits(limbs: jnp.ndarray, n_bits: int = 255) -> jnp.ndarray:
    """(n_limbs, ...) canonical 12-bit limb array -> (n_bits, ...) LE bits."""
    n_limbs = limbs.shape[0]
    shifts = jnp.arange(L.LIMB_BITS, dtype=jnp.int32)
    expanded = (
        limbs[:, None] >> shifts.reshape(1, -1, *([1] * (limbs.ndim - 1)))
    ) & 1
    bits = expanded.reshape(n_limbs * L.LIMB_BITS, *limbs.shape[1:])
    return bits[:n_bits]


def digits_from_bits(bits: jnp.ndarray, c: int, n_windows: int) -> jnp.ndarray:
    """(n_bits, N) bits -> (n_windows, N) c-bit digits (LE windows)."""
    n_bits = n_windows * c
    pad = n_bits - bits.shape[0]
    if pad > 0:
        bits = jnp.concatenate(
            [bits, jnp.zeros((pad, *bits.shape[1:]), bits.dtype)], axis=0
        )
    w = bits[:n_bits].reshape(n_windows, c, *bits.shape[1:])
    weights = (1 << jnp.arange(c, dtype=jnp.int32)).reshape(
        1, c, *([1] * (bits.ndim - 1))
    )
    return jnp.sum(w * weights, axis=1)


def _tree_sum(F, pts, axis_size):
    """Pairwise tree reduction of a point batch over its last axis."""
    n = axis_size
    pad = 1 << max(0, (n - 1).bit_length())
    if pad != n:
        ident = W.identity(F, (pad - n,))
        pts = jax.tree.map(
            lambda x, i: jnp.concatenate(
                [x, jnp.broadcast_to(i, x.shape[:-1] + (pad - n,))], axis=-1
            ),
            pts, ident,
        )
        n = pad
    while n > 1:
        half = n // 2
        a = tmap(lambda x: x[..., :half], pts)
        b = tmap(lambda x: x[..., half:n], pts)
        pts = W.add(F, a, b)
        n = half
    return tmap(lambda x: x[..., 0], pts)


class Msm:
    """Variable-base MSM over one Weierstrass group (G1 or G2)."""

    def __init__(self, field, c: int | None = None, n_bits: int = 255,
                 window_group: int | None = None, mode: str | None = None):
        self.F = field
        self.c = WINDOW_C if c is None else c
        self.n_bits = n_bits
        self.n_windows = -(-n_bits // self.c)
        self.window_group = (
            int(_os.environ.get("ZEROCHAIN_MSM_WG", "4"))
            if window_group is None else window_group
        )
        # 'hs' (default): Hillis–Steele lax.scan — N·log N adds but ONE
        # point-add instance, which with the fused Pallas group-law kernel
        # (ec/pallas_ec.py) means ONE Mosaic kernel compile and a compact
        # XLA module.  'assoc': work-efficient associative_scan (~2N adds)
        # — best steady-state arithmetic, but jax's odd/even recursion
        # instantiates the add at ~log2(N) distinct widths, each a fresh
        # multi-minute kernel/module compile; worth it only when the
        # compile cache is reliable (the tunneled worker's restarts rotate
        # the cache key, so cold compiles dominate here).
        if mode is None:
            mode = _os.environ.get("ZEROCHAIN_MSM_SCAN", "")
        if not mode:
            mode = "hs"
        self.mode = mode
        self._jit = jax.jit(self._impl)

    def _window_total(self, points_jac, keys):
        """Bucket-accumulate one window; returns a single Jacobian point.

        Work-efficient: sort by digit, then an ``associative_scan`` with the
        lifted segmented-add operator (~2N point-adds instead of the N·log N
        of a Hillis–Steele formulation), then a suffix-scan bucket fold
        (two parallel passes over the 2^c buckets instead of 2·2^c
        sequential adds).  The reference's bellman fork fans buckets across
        CPU threads with scalar adds (SURVEY.md §2.3); none of that maps to
        the VPU, this does."""
        F = self.F
        order = jnp.argsort(keys)
        keys_s = jnp.take(keys, order)
        pts_s = tmap(lambda a: jnp.take(a, order, axis=-1), points_jac)

        starts = jnp.concatenate(
            [jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]]
        )

        if self.mode == "assoc":
            flags = starts[None, :]  # (1, N): rides like a limb plane

            def seg_op(left, right):
                (pl_, fl_), (pr_, fr_) = left, right
                merged = W.add(F, pl_, pr_)
                pt = W.select(F, fr_[0], pr_, merged)
                return (pt, jnp.logical_or(fl_, fr_))

            prefix, _ = jax.lax.associative_scan(
                seg_op, (pts_s, flags), axis=1
            )
        else:
            # Hillis–Steele: log2(N) levels through ONE point-add graph;
            # on TPU the whole level body (add + both masked selects) is
            # ONE fused Pallas kernel -> one Mosaic compile for the module
            n = keys.shape[0]
            pos = jnp.arange(n)
            n_levels = max(1, (n - 1).bit_length())
            shifts = jnp.asarray([1 << d for d in range(n_levels)], jnp.int32)
            fused = W._fused(F, pts_s)

            def level(carry, s):
                x, f = carry
                xl = tmap(lambda a: jnp.roll(a, s, axis=-1), x)
                fl = jnp.roll(f, s)
                f_new = jnp.logical_or(f, fl)
                keep = pos < s  # no left neighbour at distance s
                if fused:
                    from ..ec import pallas_ec

                    out = pallas_ec.hs_add_select(F.name, xl, x, f, keep)
                else:
                    merged = W.add(F, xl, x)
                    cand = W.select(F, f, x, merged)  # segment start
                    out = W.select(F, keep, x, cand)
                f_out = jnp.where(keep, f, f_new)
                return (out, f_out), None

            (prefix, _), _ = jax.lax.scan(level, (pts_s, starts), shifts)

        ends = jnp.concatenate(
            [keys_s[1:] != keys_s[:-1], jnp.ones((1,), bool)]
        )

        # scatter segment sums into 2^c buckets (masked -> dummy slot)
        nb = 1 << self.c
        idx = jnp.where(ends, keys_s, nb)

        def scatter(dst, src):
            padded = jnp.concatenate(
                [dst, jnp.zeros((*dst.shape[:-1], 1), dst.dtype)], axis=-1
            )
            return padded.at[..., idx].set(src)[..., :nb]

        buckets = tuple(
            tuple(scatter(d, s) for d, s in zip(dc, sc))
            if isinstance(dc, tuple) else scatter(dc, sc)
            for dc, sc in zip(W.identity(F, (nb,)), prefix)
        )

        if self.mode == "assoc":
            # Σ_v v·B_v = Σ_{v≥1} suffix_v where suffix_v = Σ_{u≥v} B_u
            suffix = jax.lax.associative_scan(
                lambda x, y: W.add(F, x, y), buckets, axis=1, reverse=True
            )
            return _tree_sum(F, tmap(lambda a: a[..., 1:], suffix), nb - 1)

        # running-sum fold over buckets nb-1 .. 1 (one compact lax.scan)
        def step(carry, i):
            running, total = carry
            b = tmap(lambda a: a[..., i], buckets)
            running = W.add(F, running, b)
            total = W.add(F, total, running)
            return (running, total), None

        idxs = jnp.arange(nb - 1, 0, -1)
        init = (W.identity(F, ()), W.identity(F, ()))
        (_, total), _ = jax.lax.scan(step, init, idxs)
        return total

    def _impl(self, points_jac, bits):
        F = self.F
        digits = digits_from_bits(bits, self.c, self.n_windows)

        # Proof-batch axes after the point axis (bits (n_bits, N, *B)):
        # vmap the per-window bucket accumulation over them with the point
        # set broadcast, so one kernel pass serves the whole proof batch.
        wt = self._window_total
        for _ in range(digits.ndim - 2):
            wt = jax.vmap(wt, in_axes=(None, -1), out_axes=-1)

        # window groups: vectorize `wg` windows through one scan step
        # (wider kernels, fewer dispatches) without materializing all
        # n_windows sorted point copies at once
        wg = max(1, min(self.window_group, self.n_windows))
        wtg = jax.vmap(wt, in_axes=(None, 0), out_axes=0)
        nw_pad = -(-self.n_windows // wg) * wg
        if nw_pad != self.n_windows:  # zero digits -> identity totals
            digits = jnp.concatenate(
                [digits,
                 jnp.zeros((nw_pad - self.n_windows, *digits.shape[1:]),
                           digits.dtype)],
                axis=0,
            )
        groups = digits.reshape(nw_pad // wg, wg, *digits.shape[1:])

        def body(_, keys_g):
            return None, wtg(points_jac, keys_g)

        _, totals = jax.lax.scan(body, None, groups)  # leaves (ng, wg, ...)
        totals = jax.tree.map(
            lambda a: a.reshape(nw_pad, *a.shape[2:]), totals
        )

        # combine windows MSB-first: res = 2^c * res + T_w (scan, compact)
        def comb(res, tw):
            for _ in range(self.c):
                res = W.double(F, res)
            return W.add(F, res, tw), None

        init = tmap(lambda a: a[self.n_windows - 1], totals)
        if self.n_windows == 1:
            return init
        rest = tmap(lambda a: a[self.n_windows - 2 :: -1], totals)
        res, _ = jax.lax.scan(comb, init, rest)
        return res

    def __call__(self, points_jac, bits):
        """points_jac: Jacobian arrays batch (N,); bits: (n_bits, N) ->
        single Jacobian point."""
        return self._jit(points_jac, bits)


class FixedBaseMsm:
    """Same-base MSM g^{e_i}: windowed table + gather + tree reduction."""

    def __init__(self, field, base_affine, c: int | None = None,
                 n_bits: int = 255, grp=None):
        self.F = field
        self.c = WINDOW_C if c is None else c
        self.n_bits = n_bits
        self.n_windows = -(-n_bits // self.c)
        if grp is None:
            from ..ec import g1 as _g1, g2 as _g2

            grp = _g1 if field is FqOps else _g2
        self.grp = grp
        self.table = self._build_table(base_affine)  # batch (nw, 2^c)
        self._jit = jax.jit(self._impl)

    def _build_table(self, base_affine):
        """Host-side windowed table (mirror Jacobian, milliseconds), stored
        as NUMPY mont-limb arrays: numpy constants embed host-side at
        lowering, avoiding device round trips through the tunnel."""
        from ..mirror import curves as cv

        nw, nb = self.n_windows, 1 << self.c
        if self.F is FqOps:
            jac, to_aff = cv._G1_JAC, cv._jac_to_affine_g1
        else:
            jac, to_aff = cv._G2_JAC, cv._jac_to_affine_g2

        # table[w][k] = k * 2^{cw} * base (affine host ints; None=identity)
        flat = []
        cur = base_affine
        for _ in range(nw):
            acc = None
            flat.append(None)
            for _ in range(nb - 1):
                acc = jac.add_mixed(acc, cur)
                flat.append(to_aff(acc))
            j = (cur[0], cur[1], jac.one)
            for _ in range(self.c):
                j = jac.double(j)
            cur = to_aff(j)

        # -> Jacobian numpy limb planes, batch (nw * nb,) reshaped later
        xs, ys, zs = [], [], []
        for p in flat:
            if p is None:
                if self.F is FqOps:
                    xs.append(0); ys.append(0); zs.append(0)
                else:
                    xs.append((0, 0)); ys.append((0, 0)); zs.append((0, 0))
            else:
                xs.append(p[0]); ys.append(p[1])
                zs.append(1 if self.F is FqOps else (1, 0))

        def npify(vals):
            if self.F is FqOps:
                from ..mirror.field import Q

                out = np.zeros((L.FQ.n, len(vals)), dtype=np.int32)
                for j, v in enumerate(vals):
                    out[:, j] = L._int_to_limbs(
                        v * L.FQ.r_mod_p % Q, L.FQ.n
                    )
                return out.reshape(L.FQ.n, nw, nb)
            c0 = npify_g1([v[0] for v in vals])
            c1 = npify_g1([v[1] for v in vals])
            return (c0, c1)

        def npify_g1(vals):
            from ..mirror.field import Q

            out = np.zeros((L.FQ.n, len(vals)), dtype=np.int32)
            for j, v in enumerate(vals):
                out[:, j] = L._int_to_limbs(v * L.FQ.r_mod_p % Q, L.FQ.n)
            return out.reshape(L.FQ.n, nw, nb)

        return (npify(xs), npify(ys), npify(zs))

    def __call__(self, bits):
        """bits: (n_bits, N) -> Jacobian arrays batch (N,)."""
        return self._jit(bits)

    def _impl(self, bits):
        F = self.F
        digits = digits_from_bits(bits, self.c, self.n_windows)  # (nw, N)
        nb = 1 << self.c
        flat_idx = digits + (jnp.arange(self.n_windows) * nb)[:, None]

        def gather(comp):
            flat = comp.reshape(*comp.shape[:-2], self.n_windows * nb)
            return jnp.take(flat, flat_idx, axis=-1)  # (limbs, nw, N)

        pts = tmap(gather, self.table)

        # tree-reduce over the window axis (-2)
        n = self.n_windows
        while n > 1:
            half = n // 2
            a = tmap(lambda x: x[..., 0:half, :], pts)
            b = tmap(lambda x: x[..., half : 2 * half, :], pts)
            s = W.add(F, a, b)
            if n % 2:
                last = tmap(lambda x: x[..., n - 1 : n, :], pts)
                s = jax.tree.map(
                    lambda x, y: jnp.concatenate([x, y], axis=-2), s, last
                )
            pts = s
            n = (n + 1) // 2
        return tmap(lambda x: x[..., 0, :], pts)


from functools import lru_cache


@lru_cache(maxsize=None)
def _naive_msm_jit(field):
    return jax.jit(lambda pts, bits: _naive_msm_impl(field, pts, bits))


def naive_msm(field, points_jac, bits):
    """Per-point scalar mul + tree sum — for small N (verifier MSM)."""
    return _naive_msm_jit(field)(points_jac, bits)


def _naive_msm_impl(field, points_jac, bits):
    F = field
    muls = W.scalar_mul_bits(F, (points_jac[0], points_jac[1]), bits)
    p = muls
    n = bits.shape[-1]
    while n > 1:
        half = n // 2
        a = tmap(lambda x: x[..., 0:half], p)
        b = tmap(lambda x: x[..., half : 2 * half], p)
        s = W.add(F, a, b)
        if n % 2:
            last = tmap(lambda x: x[..., n - 1 : n], p)
            s = jax.tree.map(
                lambda x, y: jnp.concatenate([x, y], axis=-1), s, last
            )
        p = s
        n = (n + 1) // 2
    return tmap(lambda x: x[..., 0], p)


# ---------------------------------------------------------------- host API
def _pad_size(n: int) -> int:
    """Round up to a small set of shapes so compilations are reused."""
    size = 64
    while size < n:
        size *= 2
    return size


def _msm_host(grp, field, points, scalars):
    """Host-level MSM: mirror affine points + int scalars -> affine point.

    Inputs are padded (identity points, zero scalars) to bucketed sizes so
    each group needs only a handful of compiled variants."""
    pairs = [(p, s) for p, s in zip(points, scalars) if p is not None and s]
    if not pairs:
        return None
    pts, scs = zip(*pairs)
    n = len(pts)
    padded = _pad_size(n)
    pts = list(pts) + [None] * (padded - n)
    scs = list(scs) + [0] * (padded - n)
    jac = grp.from_affine_host(pts)
    bits = scalars_to_bits(scs, 255)
    if padded <= 64:
        res = naive_msm(field, jac, bits)
    else:
        res = Msm(field)(jac, bits)
    return grp.to_affine_host(tmap(lambda a: a[..., None], res))[0]


def msm_g1(points, scalars):
    from ..ec import g1 as grp

    return _msm_host(grp, FqOps, points, scalars)


def msm_g2(points, scalars):
    from ..ec import g2 as grp

    return _msm_host(grp, Fq2Ops, points, scalars)
