"""Exact big-integer field arithmetic in 12-bit limbs on int32 lanes.

Why 12 bits: TPUs have no 64-bit integer ALU, and float paths are only
exact to 2^24.  With b=12, a limb product is < 2^24 and a full 32-term
schoolbook accumulation stays < 2^30, so everything fits exactly in int32
vector lanes (the reference's u64 CIOS — fq.rs:915 — relies on u128
carries we don't have).

Layout: limbs lead — an element batch is ``(n, *batch)`` — keeping the
batch on the TPU lane dimension.  All public ops preserve canonical form
(limbs in [0, 2^12), value in [0, p)) and are Montgomery-domain unless
named otherwise.

Carry resolution: a couple of cheap mask/shift passes bound limbs to
[0, 2^12], then a Kogge–Stone generate/propagate ``associative_scan``
resolves the remaining 0/1 ripple exactly in log2(n) steps.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..mirror import field as mf

LIMB_BITS = 12
LIMB_MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs(v: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        out[i] = v & LIMB_MASK
        v >>= LIMB_BITS
    assert v == 0, "value does not fit in limbs"
    return out


@dataclass(frozen=True)
class FieldSpec:
    """Prime field in 12-bit limb form with Montgomery constants."""

    name: str
    p: int
    n: int  # number of limbs; R = 2^(12n) > p required
    p_limbs: np.ndarray = dfield(init=False, repr=False, compare=False)
    r_mod_p: int = dfield(init=False, repr=False, compare=False)
    r2_mod_p: int = dfield(init=False, repr=False, compare=False)
    inv: int = dfield(init=False, repr=False, compare=False)  # -p^-1 mod 2^12

    def __post_init__(self):
        # R > 2p so that add() can never carry out of the top limb
        assert (1 << (LIMB_BITS * self.n)) > 2 * self.p
        object.__setattr__(self, "p_limbs", _int_to_limbs(self.p, self.n))
        r = pow(2, LIMB_BITS * self.n, self.p)
        object.__setattr__(self, "r_mod_p", r)
        object.__setattr__(self, "r2_mod_p", r * r % self.p)
        object.__setattr__(
            self, "inv", (-pow(self.p, -1, 1 << LIMB_BITS)) & LIMB_MASK
        )

    # ---- host-side conversions -------------------------------------
    def to_limbs(self, v: int) -> np.ndarray:
        """Canonical int -> (n,) limbs (not Montgomery)."""
        return _int_to_limbs(v % self.p, self.n)

    def from_limbs(self, limbs) -> int:
        limbs = np.asarray(limbs)
        v = 0
        for i in range(self.n - 1, -1, -1):
            v = (v << LIMB_BITS) | int(limbs[i])
        return v

    def array(self, values, batch_last=True) -> jnp.ndarray:
        """ints -> (n, len(values)) canonical limb array (not Montgomery)."""
        vs = [self.to_limbs(v) for v in values]
        return jnp.asarray(np.stack(vs, axis=-1), dtype=jnp.int32)

    def to_ints(self, arr) -> list[int]:
        a = np.asarray(arr)
        flat = a.reshape(self.n, -1)
        return [self.from_limbs(flat[:, j]) for j in range(flat.shape[1])]


FQ = FieldSpec("Fq", mf.Q, 32)   # R = 2^384, same Montgomery R as reference
FR = FieldSpec("Fr", mf.R, 22)   # R = 2^264
FS = FieldSpec("Fs", mf.S, 22)   # R = 2^264 (2^252 would drop add carries)


# ---------------------------------------------------------------------
# carry resolution
# ---------------------------------------------------------------------

def _compact_graphs() -> bool:
    """Trace-time choice: compile-compact lax.scan carry ripples.

    The parallel (Kogge–Stone) associative_scan unrolls to ~300 jaxpr eqns
    per carry resolution; a sequential lax.scan body is 10 eqns of the
    same exact math.  Default ON everywhere: XLA:CPU's LLVM chokes on the
    unrolled 100k-eqn curve/pairing modules (tens of minutes), and on TPU
    the witness-module compile must stay cheap because the tunneled
    worker's restarts change the persistent-cache key (every bench attempt
    recompiles cold).  Hot big-batch ops bypass this entirely via the
    fused Pallas kernels; ZEROCHAIN_COMPACT_GRAPHS=0 restores the
    parallel scans."""
    if _COMPACT_ENV in ("0", "1"):
        return _COMPACT_ENV == "1"
    return True


_COMPACT_ENV = __import__("os").environ.get("ZEROCHAIN_COMPACT_GRAPHS", "")


def _ripple_carry_scan(v):
    """Sequential-carry twin of _gp_carry_scan (lax.scan over limbs)."""

    def step(c, limb):
        s = limb + c
        return s >> LIMB_BITS, s & LIMB_MASK

    _, out = jax.lax.scan(step, jnp.zeros_like(v[0]), v)
    return out


def _ripple_borrow_scan(d):
    """Sequential-borrow twin of _borrow_scan."""

    def step(b, limb):
        s = limb - b
        borrow = (s < 0).astype(jnp.int32)
        return borrow, s + (borrow << LIMB_BITS)

    borrow_out, out = jax.lax.scan(step, jnp.zeros_like(d[0]), d)
    return out, borrow_out


def _gp_carry_scan(v):
    """Exact carry resolution for limbs in [0, 2^12] (carry ∈ {0,1}).

    Returns fully normalized limbs in [0, 2^12); drops the final carry-out
    (callers guarantee none, or handle it via an extra limb).
    """
    if _compact_graphs():
        return _ripple_carry_scan(v)
    g = (v > LIMB_MASK).astype(jnp.int32)   # generates a carry
    pr = (v == LIMB_MASK).astype(jnp.int32)  # propagates an incoming carry

    def op(a, b):  # combine low part a with high part b
        return (b[0] | (b[1] & a[0]), a[1] & b[1])

    G, _ = jax.lax.associative_scan(op, (g, pr), axis=0)
    carry_in = jnp.concatenate(
        [jnp.zeros_like(G[:1]), G[:-1]], axis=0
    )
    return (v + carry_in) & LIMB_MASK


def normalize_weak(t, bound: int):
    """Reduce limbs with known max value `bound` to [0, 2^12] cheaply."""
    while bound > LIMB_MASK + 1:
        lo = t & LIMB_MASK
        hi = t >> LIMB_BITS
        t = lo + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
        bound = LIMB_MASK + ((bound >> LIMB_BITS) if bound >> LIMB_BITS > 1 else 1)
    return t


def normalize(t, bound: int):
    """Exact normalization of (n, ...) limbs with values in [0, bound]."""
    t = normalize_weak(t, bound)
    return _gp_carry_scan(t)


def _borrow_scan(d):
    """Resolve borrows for limb-wise differences d in [-2^12, 2^12).

    Returns (normalized limbs, borrow_out ∈ {0,1})."""
    if _compact_graphs():
        return _ripple_borrow_scan(d)
    g = (d < 0).astype(jnp.int32)
    pr = (d == 0).astype(jnp.int32)

    def op(a, b):
        return (b[0] | (b[1] & a[0]), a[1] & b[1])

    G, _ = jax.lax.associative_scan(op, (g, pr), axis=0)
    borrow_in = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    r = d - borrow_in
    out = r + ((r < 0) << LIMB_BITS)
    return out, G[-1]


# ---------------------------------------------------------------------
# basic modular ops (canonical limbs in, canonical limbs out)
# ---------------------------------------------------------------------

def zeros(spec: FieldSpec, batch=()):
    return jnp.zeros((spec.n, *batch), dtype=jnp.int32)


def ones_mont(spec: FieldSpec, batch=()):
    """Montgomery one (= R mod p), broadcast over batch."""
    one = jnp.asarray(_int_to_limbs(spec.r_mod_p, spec.n), dtype=jnp.int32)
    return jnp.broadcast_to(one.reshape(spec.n, *([1] * len(batch))),
                            (spec.n, *batch)).copy()


def _p_arr(spec: FieldSpec, like):
    shape = (spec.n,) + (1,) * (like.ndim - 1)
    return jnp.asarray(spec.p_limbs, dtype=jnp.int32).reshape(shape)


def cond_sub_p(spec: FieldSpec, a):
    """a if a < p else a - p (a normalized, value < 2p)."""
    d, borrow = _borrow_scan(a - _p_arr(spec, a))
    return jnp.where(borrow.astype(bool), a, d)


def add(spec: FieldSpec, a, b):
    from . import pallas_ff

    if pallas_ff.use_pallas(a.shape, b.shape):
        return pallas_ff.add(spec, a, b)
    t = _gp_carry_scan(a + b)  # limbs ≤ 2·mask → carries ∈ {0,1}
    # NOTE: a+b < 2p ≤ 2^(12n+1); carry out of the top limb cannot occur
    # because p < R/2 for all our specs (checked in tests).
    return cond_sub_p(spec, t)


def sub(spec: FieldSpec, a, b):
    from . import pallas_ff

    if pallas_ff.use_pallas(a.shape, b.shape):
        return pallas_ff.sub(spec, a, b)
    d, borrow = _borrow_scan(a - b)
    # if borrowed, result is a - b + R; add p to wrap into [0, p)
    dp = _gp_carry_scan(d + _p_arr(spec, d))
    return jnp.where(borrow.astype(bool), dp, d)


def neg(spec: FieldSpec, a):
    return sub(spec, zeros(spec, a.shape[1:]), a)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(cond, a, b):
    """cond broadcast over batch dims: where(cond, a, b)."""
    return jnp.where(cond[None, ...], a, b)


# ---------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------

def _school_mul(a, b, n: int):
    """Full 2n-limb product, unnormalized (limb values < 2^30).

    Anti-diagonal sums of the outer product via the skew-reshape trick
    (one pad + reshape instead of n dynamic-update-slices — keeps the XLA
    graph tiny, which dominates compile time for curve/NTT kernels)."""
    batch = a.shape[1:]
    outer = a[:, None] * b[None, :]  # (n, n, ...)
    q = jnp.concatenate(
        [outer, jnp.zeros((n, n, *batch), dtype=jnp.int32)], axis=1
    )  # (n, 2n, ...)
    flat = q.reshape(n * 2 * n, *batch)
    skew = flat[: n * (2 * n - 1)].reshape(n, 2 * n - 1, *batch)
    t = jnp.sum(skew, axis=0)  # (2n-1, ...)
    return jnp.concatenate(
        [t, jnp.zeros((1, *batch), dtype=jnp.int32)], axis=0
    )


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product aR·bR -> abR (canonical in, canonical out).

    Hot path: one fused Pallas kernel (ff/pallas_ff.py) holding the whole
    REDC in VMEM — used on TPU for batches past the tile threshold.

    Fallback (CPU tests, tiny batches): parallel REDC with three schoolbook
    products (no sequential per-limb carry chain — the whole reduction is
    carry-scan depth, which maps far better onto the VPU than the
    reference's word-serial CIOS, fq.rs:915):

        T = a*b;  m = (T mod R) * p' mod R;  res = (T + m*p) / R

    where p' = -p^-1 mod R.  The low n limbs of T + m*p vanish exactly, so
    the division is a limb shift."""
    from . import pallas_ff

    if pallas_ff.use_pallas(a.shape, b.shape):
        return pallas_ff.mont_mul(spec, a, b)
    n = spec.n
    t = _school_mul(a, b, n)  # (2n, ...), limbs < 2^29
    t = normalize(t, bound=1 << 29)

    pprime = _pprime_arr(spec, a.ndim)
    m_full = _school_mul(t[:n], jnp.broadcast_to(pprime, t[:n].shape), n)
    m = normalize(m_full, bound=1 << 29)[:n]  # (t_low * p') mod R

    p_arr = jnp.broadcast_to(
        jnp.asarray(spec.p_limbs, jnp.int32).reshape(
            (n,) + (1,) * (a.ndim - 1)
        ),
        m.shape,
    )
    mp = _school_mul(m, p_arr, n)  # (2n, ...)
    u = normalize(t + mp, bound=1 << 30)
    res = u[n:]  # exact division by R = 2^(12n)
    return cond_sub_p(spec, res)


_PPRIME_CACHE: dict = {}


def _pprime_arr(spec: FieldSpec, ndim: int):
    """-p^-1 mod R as limbs (broadcastable)."""
    key = spec.name
    if key not in _PPRIME_CACHE:
        r_limb = 1 << (LIMB_BITS * spec.n)
        pp = (-pow(spec.p, -1, r_limb)) % r_limb
        _PPRIME_CACHE[key] = _int_to_limbs(pp, spec.n)
    return jnp.asarray(_PPRIME_CACHE[key], jnp.int32).reshape(
        (spec.n,) + (1,) * (ndim - 1)
    )


def mont_sqr(spec: FieldSpec, a):
    from . import pallas_ff

    if pallas_ff.use_pallas(a.shape):
        return pallas_ff.mont_sqr(spec, a)
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    r2 = jnp.asarray(_int_to_limbs(spec.r2_mod_p, spec.n), jnp.int32).reshape(
        (spec.n,) + (1,) * (a.ndim - 1)
    )
    return mont_mul(spec, a, jnp.broadcast_to(r2, a.shape))


def from_mont(spec: FieldSpec, a):
    one = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(spec, a, one)


def pow_fixed(spec: FieldSpec, a, e: int):
    """a^e for a static exponent (a in Montgomery form). Batched."""
    bits = []
    while e:
        bits.append(e & 1)
        e >>= 1
    bits_arr = jnp.asarray(bits[::-1], dtype=jnp.int32)  # MSB first

    def body(i, st):
        acc = mont_sqr(spec, st)
        mult = mont_mul(spec, acc, a)
        return jnp.where(bits_arr[i].astype(bool), mult, acc)

    init = ones_mont(spec, a.shape[1:])
    # first bit is always 1: start from a
    return jax.lax.fori_loop(1, len(bits), body, a) if len(bits) > 1 else a


def inv_mont(spec: FieldSpec, a):
    """Fermat inverse: (aR)^-1 ... returns a^-1 R (Montgomery inverse)."""
    return pow_fixed(spec, a, spec.p - 2)


def batch_inv_mont(spec: FieldSpec, a, axis=-1):
    """Montgomery-trick batched inverse along a batch axis.

    Mirrors batch_normalization's strategy (ec.rs:246): one field inverse
    plus O(B log B) multiplications, ALL at log depth — a forward and a
    reverse ``associative_scan`` give prefix/suffix products, then

        a_i^{-1} = prefix_{i-1} * suffix_{i+1} * total^{-1}

    (prefix_{i-1} * suffix_{i+1} = total / a_i).  The earlier sequential
    suffix pass scanned the whole batch axis one element at a time — tens
    of thousands of dependent batch-1 muls inside the witness graph, which
    dominated proving wall time.  Zero entries yield zero (callers mask;
    matches reference which skips zeros).
    """
    if axis < 0:
        axis = a.ndim + axis
    assert axis != 0, "axis 0 is the limb axis"
    # replace zeros by one to keep products invertible
    zmask = is_zero(a)
    one = ones_mont(spec, a.shape[1:])
    a_safe = jnp.where(zmask[None], one, a)

    mulf = partial(mont_mul, spec)
    k = a.shape[axis]
    prefix = jax.lax.associative_scan(mulf, a_safe, axis=axis)
    suffix = jax.lax.associative_scan(mulf, a_safe, axis=axis, reverse=True)
    total_inv = inv_mont(
        spec, jax.lax.index_in_dim(prefix, k - 1, axis=axis, keepdims=False)
    )

    one_plane = jnp.asarray(
        _int_to_limbs(spec.r_mod_p, spec.n), jnp.int32
    ).reshape((spec.n,) + (1,) * (a.ndim - 1))

    def shift(x, before: bool):
        """Drop one slice and pad with Montgomery one on the other side."""
        pad = jnp.broadcast_to(
            one_plane, x.shape[:axis] + (1,) + x.shape[axis + 1 :]
        )
        if before:  # prefix_{i-1}: [one, prefix_0 .. prefix_{k-2}]
            body = jax.lax.slice_in_dim(x, 0, k - 1, axis=axis)
            return jnp.concatenate([pad, body], axis=axis)
        # suffix_{i+1}: [suffix_1 .. suffix_{k-1}, one]
        body = jax.lax.slice_in_dim(x, 1, k, axis=axis)
        return jnp.concatenate([body, pad], axis=axis)

    others = mulf(shift(prefix, True), shift(suffix, False))
    invs = mulf(
        others,
        jnp.broadcast_to(
            jnp.expand_dims(total_inv, axis), a.shape
        ),
    )
    return jnp.where(zmask[None], jnp.zeros_like(a), invs)


class _Ops:
    """Per-spec jitted op namespace (compile once, reuse everywhere)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.add = jax.jit(partial(add, spec))
        self.sub = jax.jit(partial(sub, spec))
        self.neg = jax.jit(partial(neg, spec))
        self.mul = jax.jit(partial(mont_mul, spec))
        self.sqr = jax.jit(partial(mont_sqr, spec))
        self.to_mont = jax.jit(partial(to_mont, spec))
        self.from_mont = jax.jit(partial(from_mont, spec))
        self.inv = jax.jit(partial(inv_mont, spec))
        self.batch_inv = jax.jit(partial(batch_inv_mont, spec))


_OPS_CACHE: dict = {}


def ops(spec: FieldSpec) -> _Ops:
    if spec.name not in _OPS_CACHE:
        _OPS_CACHE[spec.name] = _Ops(spec)
    return _OPS_CACHE[spec.name]


# host-side helpers
def to_limbs(spec: FieldSpec, values, mont=False):
    """list of ints -> (n, B) jnp array; optionally to Montgomery form."""
    arr = spec.array(values)
    if mont:
        vals = [v * spec.r_mod_p % spec.p for v in values]
        arr = spec.array(vals)
    return arr


def from_limbs(spec: FieldSpec, arr, mont=False):
    vals = spec.to_ints(arr)
    if mont:
        rinv = pow(spec.r_mod_p, -1, spec.p)
        vals = [v * rinv % spec.p for v in vals]
    return vals
