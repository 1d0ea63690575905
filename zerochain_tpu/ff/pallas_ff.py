"""Fused Pallas TPU kernels for Montgomery field multiplication.

One `pallas_call` performs the whole parallel-REDC product (school mul ->
ripple carry -> m = t*p' mod R -> u = (t + m*p)/R -> conditional subtract)
with every intermediate held in VMEM, instead of the ~50 separate XLA ops
the graph path lowers to.  The reference's CIOS loop (fq.rs:915) is a
word-serial u64 chain; here each 12-bit limb is an (8, 128) int32 plane and
the schoolbook loops unroll into straight-line VPU code — the TPU executes
~1.5T int32 MACs/s, giving ~2-3e8 field muls/s for Fq (n=32 limbs).

Magnitude invariants (LIMB_BITS=12):
  - limb products < 2^24; n-term anti-diagonal sums < 2^29  (int32-exact)
  - ripple carries < 2^17
so every value fits an int32 lane exactly, matching ff/limbs.py.

Layout: callers pass (n_limbs, B) canonical limb arrays; the wrapper pads B
to a multiple of LANE_TILE=1024 and shapes blocks (n_limbs, 8, 128) so the
batch rides the (sublane, lane) grid of the VPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LIMB_BITS = 12
LIMB_MASK = (1 << LIMB_BITS) - 1
SUBLANES = 8
LANES = 128
LANE_TILE = SUBLANES * LANES  # batch elements per grid step

# interpret mode: run kernel bodies as plain jax ops (CPU testing of the
# kernel logic without a TPU; combine with ZEROCHAIN_PALLAS=1)
INTERPRET = bool(int(os.environ.get("ZEROCHAIN_PALLAS_INTERPRET", "0")))


def _limbs_of(v: int, n: int) -> list[int]:
    out = []
    for _ in range(n):
        out.append(v & LIMB_MASK)
        v >>= LIMB_BITS
    assert v == 0
    return out


def _ripple(t: list, nl: int, drop_carry: bool = False) -> list:
    """Sequential carry propagation over nl limb planes (values < 2^30)."""
    out = []
    c = None
    for k in range(nl):
        v = t[k] if c is None else t[k] + c
        c = jax.lax.shift_right_logical(v, LIMB_BITS)
        out.append(jax.lax.bitwise_and(v, LIMB_MASK))
    # callers guarantee no carry out of the top limb (values < 2^(12*nl))
    del drop_carry
    return out


def _ripple_signed(t: list, nl: int) -> list:
    """Carry propagation where intermediate limb values may be NEGATIVE
    (lazy-reduction combines like t_aa + 2p^2 - t_bb).  Arithmetic
    right-shift floors toward -inf, so a negative running value borrows
    correctly; the caller guarantees the TOTAL is non-negative and
    < 2^(12*nl), so the final carry-out is zero."""
    out = []
    c = None
    for k in range(nl):
        v = t[k] if c is None else t[k] + c
        c = jax.lax.shift_right_arithmetic(v, LIMB_BITS)
        out.append(jax.lax.bitwise_and(v, LIMB_MASK))
    return out


def _cond_sub_p(res: list, p: list[int], n: int) -> list:
    """res in [0, 2p) -> res mod p, branch-free."""
    borrow = None
    d = []
    for k in range(n):
        v = res[k] - p[k] if borrow is None else res[k] - p[k] - borrow
        borrow = (v < 0).astype(jnp.int32)
        d.append(v + (borrow << LIMB_BITS))
    keep = borrow.astype(bool)  # borrowed => res < p => keep res
    return [jnp.where(keep, res[k], d[k]) for k in range(n)]


def _school(a: list, b: list, n: int, out_limbs: int) -> list:
    """Anti-diagonal sums of the limb outer product, truncated to out_limbs."""
    t = [None] * out_limbs
    for i in range(n):
        ai = a[i]
        jmax = min(n, out_limbs - i)
        for j in range(jmax):
            prod = ai * b[j]
            k = i + j
            t[k] = prod if t[k] is None else t[k] + prod
    return [x if x is not None else jnp.zeros_like(a[0]) for x in t]


def _school_const(a: list, c: list[int], n: int, out_limbs: int) -> list:
    """Like _school but the second operand is a compile-time constant."""
    t = [None] * out_limbs
    for i in range(n):
        ai = a[i]
        jmax = min(n, out_limbs - i)
        for j in range(jmax):
            if c[j] == 0:
                continue
            prod = ai * c[j]
            k = i + j
            t[k] = prod if t[k] is None else t[k] + prod
    return [x if x is not None else jnp.zeros_like(a[0]) for x in t]


def _school_sqr(a: list, n: int) -> list:
    """a*a via symmetric halving: cross terms summed once then doubled."""
    t = [None] * (2 * n)
    for i in range(n):
        for j in range(i + 1, n):
            prod = a[i] * a[j]
            k = i + j
            t[k] = prod if t[k] is None else t[k] + prod
    t = [jnp.zeros_like(a[0]) if x is None else x + x for x in t]
    for i in range(n):
        t[2 * i] = t[2 * i] + a[i] * a[i]
    return t


def _redc(t: list, n: int, p: list[int], pp: list[int]) -> list:
    """Montgomery reduction of a normalized 2n-limb t: (t + m*p)/R mod p."""
    m = _ripple(_school_const(t[:n], pp, n, n), n)  # (t mod R)*p' mod R
    mp = _school_const(m, p, n, 2 * n)
    u = _ripple([t[k] + mp[k] for k in range(2 * n)], 2 * n)
    return _cond_sub_p(u[n:], p, n)


def _sub_borrow(a: list, b, n: int):
    """a - b limb-wise with borrow ripple; returns (diff, borrow_out).

    b may be vector planes or python-int constants."""
    borrow = None
    d = []
    for k in range(n):
        bk = b[k]
        v = a[k] - bk if borrow is None else a[k] - bk - borrow
        borrow = (v < 0).astype(jnp.int32)
        d.append(v + (borrow << LIMB_BITS))
    return d, borrow


@functools.lru_cache(maxsize=None)
def _kernels(name: str, p_int: int, n: int):
    """Build per-field pallas_calls (keyed by spec name)."""
    p = _limbs_of(p_int, n)
    r_full = 1 << (LIMB_BITS * n)
    pp = _limbs_of((-pow(p_int, -1, r_full)) % r_full, n)

    def mul_kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(n)]
        b = [b_ref[i] for i in range(n)]
        t = _ripple(_school(a, b, n, 2 * n), 2 * n)
        res = _redc(t, n, p, pp)
        for k in range(n):
            o_ref[k] = res[k]

    def sqr_kernel(a_ref, o_ref):
        a = [a_ref[i] for i in range(n)]
        t = _ripple(_school_sqr(a, n), 2 * n)
        res = _redc(t, n, p, pp)
        for k in range(n):
            o_ref[k] = res[k]

    def add_kernel(a_ref, b_ref, o_ref):
        s = _ripple([a_ref[i] + b_ref[i] for i in range(n)], n)
        res = _cond_sub_p(s, p, n)
        for k in range(n):
            o_ref[k] = res[k]

    def sub_kernel(a_ref, b_ref, o_ref):
        d, borrow = _sub_borrow(
            [a_ref[i] for i in range(n)], [b_ref[i] for i in range(n)], n
        )
        # borrowed => wrapped mod R: add p back
        wrapped = borrow.astype(bool)
        dp = _ripple([d[k] + p[k] for k in range(n)], n)
        for k in range(n):
            o_ref[k] = jnp.where(wrapped, dp[k], d[k])

    block = pl.BlockSpec(
        (n, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )

    def build(kernel, n_in):
        # jax.jit so the ~3k-op kernel body traces once per shape; bare
        # pallas_call would re-trace it at every call site in a big graph
        @jax.jit
        def call(*args):
            tiles = args[0].shape[1] // SUBLANES
            return pl.pallas_call(
                kernel,
                grid=(tiles,),
                in_specs=[block] * n_in,
                out_specs=block,
                out_shape=jax.ShapeDtypeStruct(args[0].shape, jnp.int32),
                interpret=INTERPRET,
            )(*args)

        return call

    return {
        "mul": build(mul_kernel, 2),
        "sqr": build(sqr_kernel, 1),
        "add": build(add_kernel, 2),
        "sub": build(sub_kernel, 2),
    }


def _to_tiles(arr, n: int):
    """(n, *batch) -> ((n, rows, 128), batch_shape, true_batch).

    The padded size is bucketed to a power of two of LANE_TILE so each
    (op, field) compiles at most ~log2(max_batch) Mosaic kernels — the
    witness graph calls these at dozens of distinct gadget-block shapes,
    and an exact-shape kernel per call site turns warm-up into tens of
    minutes of kernel compiles."""
    batch_shape = arr.shape[1:]
    flat = arr.reshape(n, -1)
    bsz = flat.shape[1]
    tiles = -(-bsz // LANE_TILE)
    tiles = 1 << max(0, tiles - 1).bit_length()
    if tiles == 2:  # measured: grid=2 hits a 25x-slower Mosaic compile path
        tiles = 4
    padded = tiles * LANE_TILE
    if padded != bsz:
        flat = jnp.concatenate(
            [flat, jnp.zeros((n, padded - bsz), jnp.int32)], axis=1
        )
    return flat.reshape(n, padded // LANES, LANES), batch_shape, bsz


def _from_tiles(out, batch_shape, bsz, n: int):
    return out.reshape(n, -1)[:, :bsz].reshape(n, *batch_shape)


def _binop(op: str, spec, a, b):
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    kern = _kernels(spec.name, spec.p, spec.n)[op]
    at, bshape, bsz = _to_tiles(a, spec.n)
    bt, _, _ = _to_tiles(b, spec.n)
    return _from_tiles(kern(at, bt), bshape, bsz, spec.n)


def mont_mul(spec, a, b):
    """Pallas Montgomery product; drop-in for limbs.mont_mul on TPU."""
    return _binop("mul", spec, a, b)


def add(spec, a, b):
    return _binop("add", spec, a, b)


def sub(spec, a, b):
    return _binop("sub", spec, a, b)


def mont_sqr(spec, a):
    sqr = _kernels(spec.name, spec.p, spec.n)["sqr"]
    at, bshape, bsz = _to_tiles(a, spec.n)
    return _from_tiles(sqr(at), bshape, bsz, spec.n)


# ---------------------------------------------------------------- gating

import threading
from contextlib import contextmanager

_FORCE = os.environ.get("ZEROCHAIN_PALLAS", "")  # "1" force-on, "0" off
MIN_BATCH = int(os.environ.get("ZEROCHAIN_PALLAS_MIN_BATCH", "1024"))
_TLS = threading.local()


@contextmanager
def forced(on: bool = True):
    """Trace-time override: route EVERY field op in scope through the
    fused kernels (on TPU), ignoring the MIN_BATCH heuristic.

    Compile-cost tool, not just a perf knob: a module that mixes fused
    kernels with composed small-width ops inlines a multi-k-eqn graph per
    composed op — the suffix-MSM module's unrolled small-width tree adds
    pushed XLA:TPU compiles past 20 minutes until routed here.  No-op on
    non-TPU backends (the kernels need real TPU lowering)."""
    prev = getattr(_TLS, "force", None)
    _TLS.force = on
    try:
        yield
    finally:
        _TLS.force = prev


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001 — no backend at all
        return False


def use_pallas(a_shape, b_shape=None) -> bool:
    """Static (trace-time) routing decision for a field op."""
    if _FORCE == "0":
        return False
    tls = getattr(_TLS, "force", None)
    if tls is not None:
        return bool(tls) and _on_tpu()
    shape = (
        jnp.broadcast_shapes(a_shape, b_shape) if b_shape is not None
        else a_shape
    )
    batch = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
    if _FORCE == "1":
        return batch >= 1
    return _on_tpu() and batch >= MIN_BATCH
