"""Batched field arithmetic for TPU (JAX/XLA, with Pallas fast paths).

Design (SURVEY.md §7): field elements are arrays of 12-bit limbs held in
int32 lanes, **limbs-leading** — shape ``(n_limbs, *batch)`` — so the batch
dimension is minor-most and maps onto the TPU's 128-wide vector lanes.
Montgomery representation with R = 2^(12·n_limbs); all kernels are exact
integer arithmetic (products ≤ 2^24, ≤ 32-term accumulations ≤ 2^30 < int32).

The reference implements one-scalar-at-a-time CIOS over u64 limbs
(core/pairing/src/bls12_381/fq.rs:915-1090); this is the array-programming
re-design of the same math for a machine without 64-bit ALUs.
"""

from .limbs import (  # noqa: F401
    FieldSpec,
    FQ,
    FR,
    FS,
    add,
    sub,
    neg,
    mont_mul,
    mont_sqr,
    to_mont,
    from_mont,
    inv_mont,
    batch_inv_mont,
    pow_fixed,
    is_zero,
    eq,
    select,
    zeros,
    ones_mont,
    to_limbs,
    from_limbs,
    normalize_weak,
    cond_sub_p,
)
