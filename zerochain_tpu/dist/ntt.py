"""Four-step distributed NTT family over Fr (shard_map + all_to_all).

Decompose d = d1*d2 with rows j sharded over the mesh axis:
  B[j, k] = x[k*d1 + j]
  1. local length-d2 (i)NTT along k (root w^d1)
  2. local twiddle multiply by w^{+-j*r}
  3. all_to_all transpose (the only inter-chip exchange, rides ICI)
  4. local length-d1 (i)NTT along j (root w^d2)
giving Y[q*d2 + r] = E[q, r].  Everything else stays chip-local, so the
communication volume is one full-array exchange per transform (plus the
final all_gather that re-replicates the result for the caller).

The INVERSE transform is the same machinery with inverse roots: the two
local intts contribute 1/d1 * 1/d2 = 1/d, and the middle twiddles flip to
w^{-j*r}.  COSET scalings are separable across the decomposition
(g^(k*d1+j) = g^j * (g^d1)^k), so the coset/icoset variants add only
local elementwise multiplies — which is what the Groth16 quotient stage
needs: intt -> coset_ntt -> pointwise -> divide-by-z -> icoset_ntt
(prover_tpu/pipeline._h_scalars; bellman's EvaluationDomain h-poly
pipeline, SURVEY.md §2.3/§2.4).

DistNtt transforms take replicated (n_limbs, *batch, d) Montgomery limb
arrays and return replicated results; inside, the d axis is sharded and
exchanged.  (A fully shard-resident chain would also keep the pointwise
stages sharded — the re-replication between stages costs one extra
all_gather per transform and keeps the interfaces composable with the
rest of the prover.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ff import limbs as L
from ..groth16 import domain as dom
from ..mirror.field import R, FR_GENERATOR, fr_inv
from ..ntt.ntt import _to_mont_np, plan_for

FR = L.FR


def _twiddle_matrix(d1: int, d2: int, omega: int) -> jnp.ndarray:
    """(n_limbs, d1, d2) Montgomery array of w^{j*r}.

    Large matrices (the 2^22 domain needs 2048x2048) are built on
    device: row j+1 = row j * [w^r]_r via one lax.scan of mont_muls —
    host bigint conversion of d1*d2 values would cost ~10 us each."""
    if d1 * d2 <= 1 << 16:
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

    wvec = jnp.asarray(_pow_vec(omega, d2))  # (L, d2): w^r
    ones = jnp.asarray(_to_mont_np([1] * d2))

    @jax.jit
    def build(wv, start):
        def step(carry, _):
            return L.mont_mul(FR, carry, wv), carry

        _, rows = jax.lax.scan(step, start, None, length=d1)
        return jnp.moveaxis(rows, 0, 1)  # (L, d1, d2)

    return build(wvec, ones)


def _pow_vec(base: int, n: int) -> jnp.ndarray:
    """(n_limbs, n) Montgomery powers base^0..base^(n-1)."""
    out, cur = [], 1
    for _ in range(n):
        out.append(cur)
        cur = cur * base % R
    return jnp.asarray(_to_mont_np(out))


class DistNtt:
    """Distributed transforms for one (d1, d2, mesh, axis) config."""

    def __init__(self, d1: int, d2: int, mesh: Mesh, axis_name: str):
        self.d1, self.d2, self.d = d1, d2, d1 * d2
        self.mesh, self.axis = mesh, axis_name
        self.n_dev = mesh.shape[axis_name]
        assert d1 % self.n_dev == 0 and d2 % self.n_dev == 0, (
            d1, d2, self.n_dev
        )
        omega = dom.omega_for(self.d)
        omega_inv = fr_inv(omega)
        self.tw_f = _twiddle_matrix(d1, d2, omega)
        self.tw_i = _twiddle_matrix(d1, d2, omega_inv)
        g, gi = FR_GENERATOR, fr_inv(FR_GENERATOR)
        # coset pre-scale in input layout B[j, k] (i = k*d1 + j)
        self.cs_row = _pow_vec(g, d1)                   # g^j over j
        self.cs_col = _pow_vec(pow(g, d1, R), d2)       # (g^d1)^k over k
        # icoset post-scale in output layout E[q, r] (i = q*d2 + r)
        self.ics_row = _pow_vec(pow(gi, d2, R), d1)     # (g^-d2)^q over q
        self.ics_col = _pow_vec(gi, d2)                 # g^-r over r
        self.zinv = jnp.asarray(
            _to_mont_np([fr_inv((pow(g, self.d, R) - 1) % R)])[:, 0]
        )
        self.plan1, self.plan2 = plan_for(d1), plan_for(d2)
        self._cache: dict = {}

    # ------------------------------------------------------------------
    def _build(self, batch_rank: int, inverse: bool, coset_pre: bool,
               coset_post: bool):
        d1, d2, n_dev, axis = self.d1, self.d2, self.n_dev, self.axis
        plan1, plan2 = self.plan1, self.plan2
        bn = (None,) * batch_rank

        def bcast(vec_rowcol, xb_ndim, row_len, col_len):
            return vec_rowcol.reshape(
                (FR.n,) + (1,) * (xb_ndim - 3) + (row_len, col_len)
            )

        def local(xb, twb, pre_row_b, post_row_b):
            # xb: (L, *batch, d1/n, d2); twb/pre/post rows: local slices
            if coset_pre:
                rows = pre_row_b.reshape(
                    (FR.n,) + (1,) * (xb.ndim - 3) + (xb.shape[-2], 1)
                )
                cols = self.cs_col.reshape(
                    (FR.n,) + (1,) * (xb.ndim - 3) + (1, d2)
                )
                xb = L.mont_mul(FR, xb, jnp.broadcast_to(rows, xb.shape))
                xb = L.mont_mul(FR, xb, jnp.broadcast_to(cols, xb.shape))
            # step 1: local transform along k
            c = (plan2.intt if inverse else plan2.ntt)(xb)
            # step 2: twiddles w^{+-j*r} (local j rows)
            tw = twb.reshape(
                (FR.n,) + (1,) * (c.ndim - 3) + twb.shape[-2:]
            )
            c = L.mont_mul(FR, c, jnp.broadcast_to(tw, c.shape))
            # step 3: all_to_all transpose -> (L, *batch, d1, d2/n)
            lead = c.shape[: 1 + batch_rank]
            c = c.reshape(*lead, d1 // n_dev, n_dev, d2 // n_dev)
            c = jax.lax.all_to_all(
                c, axis, split_axis=1 + batch_rank + 1,
                concat_axis=1 + batch_rank, tiled=False,
            )
            c = c.reshape(*lead, d1, d2 // n_dev)
            # step 4: local transform along j
            c = jnp.swapaxes(c, -1, -2)  # (L, *batch, d2/n, d1)
            e = (plan1.intt if inverse else plan1.ntt)(c)
            e = jnp.swapaxes(e, -1, -2)  # (L, *batch, d1, d2/n) = E[q, r]
            if coset_post:
                rows = self.ics_row.reshape(
                    (FR.n,) + (1,) * (e.ndim - 3) + (d1, 1)
                )
                cols = post_row_b.reshape(
                    (FR.n,) + (1,) * (e.ndim - 3) + (1, e.shape[-1])
                )
                e = L.mont_mul(FR, e, jnp.broadcast_to(rows, e.shape))
                e = L.mont_mul(FR, e, jnp.broadcast_to(cols, e.shape))
            # re-replicate: gather the r shards
            return jax.lax.all_gather(
                e, axis, axis=e.ndim - 1, tiled=True
            )

        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(
                P(None, *bn, axis, None),   # B rows j sharded
                P(None, axis, None),        # twiddle rows j sharded
                P(None, axis),              # coset pre rows (g^j)
                P(None, axis),              # icoset post cols (g^-r)
            ),
            out_specs=P(*(None,) * (2 + batch_rank), None),
            check_vma=False,
        )

    def _run(self, x, inverse: bool, coset_pre: bool, coset_post: bool):
        """x: (L, *batch, d) replicated -> same, transformed."""
        d1, d2 = self.d1, self.d2
        batch = x.shape[1:-1]
        key = (len(batch), inverse, coset_pre, coset_post)
        if key not in self._cache:
            self._cache[key] = jax.jit(
                self._build(len(batch), inverse, coset_pre, coset_post)
            )
        # B[j, k] = x[k*d1 + j]
        B = jnp.swapaxes(
            x.reshape(FR.n, *batch, d2, d1), -1, -2
        )
        tw = self.tw_i if inverse else self.tw_f
        E = self._cache[key](B, tw, self.cs_row, self.ics_col)
        # Y[q*d2 + r] = E[q, r]
        return E.reshape(FR.n, *batch, self.d)

    # public ------------------------------------------------------------
    def ntt(self, x):
        return self._run(x, False, False, False)

    def intt(self, x):
        return self._run(x, True, False, False)

    def coset_ntt(self, x):
        return self._run(x, False, True, False)

    def icoset_ntt(self, x):
        return self._run(x, True, False, True)

    def quotient(self, a_ev, b_ev, c_ev):
        """Padded constraint evaluations (L, *batch, d) -> coset quotient
        evaluations h = (A*B - C) / Z on the coset, back in coefficient
        form — the distributed twin of NttPlan's chain inside
        pipeline._h_scalars."""
        a_c = self.coset_ntt(self.intt(a_ev))
        b_c = self.coset_ntt(self.intt(b_ev))
        c_c = self.coset_ntt(self.intt(c_ev))
        q = L.sub(FR, L.mont_mul(FR, a_c, b_c), c_c)
        z = self.zinv.reshape((FR.n,) + (1,) * (q.ndim - 1))
        q = L.mont_mul(FR, q, jnp.broadcast_to(z, q.shape))
        return self.icoset_ntt(q)


_DIST_PLANS: dict = {}


def dist_plan_for(d: int, mesh: Mesh, axis_name: str) -> DistNtt:
    """Split d ~ sqrt-balanced with both factors divisible by the mesh
    axis size."""
    key = (d, mesh, axis_name)
    if key not in _DIST_PLANS:
        lg = d.bit_length() - 1
        d1 = 1 << ((lg + 1) // 2)
        d2 = d // d1
        n_dev = mesh.shape[axis_name]
        while d2 % n_dev != 0 and d1 < d:
            d1 <<= 1
            d2 >>= 1
        _DIST_PLANS[key] = DistNtt(d1, d2, mesh, axis_name)
    return _DIST_PLANS[key]


def distributed_ntt(x, mesh: Mesh, axis_name: str, d1: int, d2: int):
    """x: (n_limbs, d) Montgomery limb array, replicated input ->
    (n_limbs, d) NTT output, computed with rows sharded over `axis_name`
    (kept as the dryrun/test entry point)."""
    return DistNtt(d1, d2, mesh, axis_name).ntt(x)
