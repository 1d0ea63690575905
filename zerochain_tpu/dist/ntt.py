"""Four-step distributed NTT over Fr (shard_map + all_to_all).

Decompose d = d1*d2 with rows j sharded over the mesh axis:
  B[j, k] = x[k*d1 + j]
  1. local length-d2 NTT along k (root w^d1)
  2. local twiddle multiply by w^{j*r}
  3. all_to_all transpose (the only inter-chip exchange, rides ICI)
  4. local length-d1 NTT along j (root w^d2)
giving Y[q*d2 + r] = E[q, r].  Everything else stays chip-local, so the
communication volume is exactly one full-array exchange per transform.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ff import limbs as L
from ..groth16 import domain as dom
from ..mirror.field import R, fr_inv
from ..ntt.ntt import NttPlan, _to_mont_np, plan_for

FR = L.FR


def _twiddle_matrix(d1: int, d2: int, omega: int) -> jnp.ndarray:
    """(n_limbs, d1, d2) Montgomery array of w^{j*r}."""
    rows = []
    for j in range(d1):
        base = pow(omega, j, R)
        cur = 1
        row = []
        for _ in range(d2):
            row.append(cur)
            cur = cur * base % R
        rows.extend(row)
    flat = _to_mont_np(rows)  # (L, d1*d2)
    return jnp.asarray(flat).reshape(FR.n, d1, d2)


def distributed_ntt(x, mesh: Mesh, axis_name: str, d1: int, d2: int):
    """x: (n_limbs, d) Montgomery limb array, replicated input ->
    (n_limbs, d) NTT output, computed with rows sharded over `axis_name`.

    Output element m = q*d2 + r comes back in natural order."""
    d = d1 * d2
    omega = dom.omega_for(d)
    plan1 = plan_for(d1)
    plan2 = plan_for(d2)
    n_dev = mesh.shape[axis_name]
    assert d1 % n_dev == 0 and d2 % n_dev == 0

    # B[j, k] = x[k*d1 + j]
    tw = _twiddle_matrix(d1, d2, omega)

    # roots: plan_for(d2) uses omega_d2 = root of order d2 = w^{d1}  (same
    # canonical root since w^{d1} has order d2 and equals the canonical
    # omega_for(d2) only if w is the canonical root — it is, both derive
    # from FR_ROOT_OF_UNITY).
    def local(xb, twb):
        # xb: (L, d1/n, d2); step 1: NTT along k
        c = plan2.ntt(xb)
        # step 2: twiddles
        c = L.mont_mul(FR, c, twb)
        # step 3: transpose exchange: (L, d1/n, d2) -> (L, d1, d2/n)
        c = c.reshape(FR.n, xb.shape[1], n_dev, d2 // n_dev)
        c = jax.lax.all_to_all(
            c, axis_name, split_axis=2, concat_axis=1, tiled=False
        )
        # now (L, d1/n * n_dev?, ...) -> reassemble j axis
        c = c.reshape(FR.n, d1, d2 // n_dev)
        # step 4: NTT along j (axis 1): move to last axis
        c = jnp.swapaxes(c, 1, 2)  # (L, d2/n, d1)
        e = plan1.ntt(c)
        return jnp.swapaxes(e, 1, 2)  # (L, d1, d2/n) = E[q, r-slice]

    B = jnp.swapaxes(x.reshape(FR.n, d2, d1), 1, 2)  # (L, d1, d2)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, axis_name, None)),
        out_specs=P(None, None, axis_name),
    )
    E = fn(B, tw)  # (L, d1, d2) with axis2 sharded
    # Y[q*d2 + r] = E[q, r]
    return E.reshape(FR.n, d)
