"""Compiled witness synthesis for the MiniCommit fixture circuit.

Reuses the confidential compiler's gadget emitters; aux order matches
models/mini.py allocation order (validated in tests/test_tpu_pipeline_mini.py
by proving + verifying, which fails on any aux misalignment)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import limbs as L
from .witness import (
    ONE_MONT_LIMBS,
    Emitter,
    _const,
    compute_fixed_base_chains,
    emit_fixed_base,
    emit_u32_range,
)

FR = L.FR


def mini_witness(amount_u32):
    """(B,) uint32 -> (aux (L, n_aux, B), public (L, 3, B)) mont limbs."""
    em = Emitter()
    B = amount_u32.shape[0]

    bits_le = jnp.stack(
        [(amount_u32 >> i) & 1 for i in range(32)], axis=0
    ).astype(jnp.int32)
    fb = compute_fixed_base_chains([bits_le])

    emit_u32_range(em, amount_u32)
    g = emit_fixed_base(em, fb, 0, 32)

    one = jnp.broadcast_to(_const(ONE_MONT_LIMBS, 2), (FR.n, B))
    public = jnp.stack([one, g[0], g[1]], axis=1)
    return em.concat(), public


from .witness import _maybe_forced

mini_witness_jit = jax.jit(_maybe_forced(mini_witness))


def witness_inputs_host(assignments: list[dict]):
    return dict(
        amount_u32=jnp.asarray(
            np.array([a["amount"] for a in assignments], dtype=np.uint32)
        )
    )
