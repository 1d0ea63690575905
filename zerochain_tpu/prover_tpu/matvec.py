"""Sparse A/B/C constraint evaluation on device.

The circuit's linear combinations are frozen once into COO arrays
(constraint row, variable column, Fr coefficient); per-proof evaluation is
then gather -> Montgomery multiply -> segment-sum over rows — fully batched,
no interpretation.  Limb partial sums stay exact: segment sizes are < 2^7
and limbs < 2^12, so the int32 accumulator never exceeds 2^19 before
normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import limbs as L
from ..mirror.field import R
from ..r1cs.system import ConstraintSystem

FR = L.FR


def _coeffs_to_mont_limbs(coeffs: list[int]) -> np.ndarray:
    out = np.zeros((FR.n, len(coeffs)), dtype=np.int32)
    for j, c in enumerate(coeffs):
        out[:, j] = L._int_to_limbs(c * FR.r_mod_p % R, FR.n)
    return out


class ConstraintMatrices:
    """Frozen A/B/C of one circuit + a compiled batched evaluator."""

    def __init__(self, cs: ConstraintSystem, num_inputs: int):
        self.num_constraints = cs.num_constraints
        self.num_inputs = num_inputs
        self.num_aux = len(cs.aux)
        self.num_vars = num_inputs + self.num_aux

        mats = []
        for which in range(3):
            rows, cols, coeffs = [], [], []
            for cidx, constraint in enumerate(cs.constraints):
                for (kind, idx), coeff in constraint[which]:
                    rows.append(cidx)
                    cols.append(idx if kind == "I" else num_inputs + idx)
                    coeffs.append(coeff % R)
            order = np.argsort(np.asarray(rows, dtype=np.int64), kind="stable")
            rows = np.asarray(rows, dtype=np.int32)[order]
            cols = np.asarray(cols, dtype=np.int32)[order]
            cmat = _coeffs_to_mont_limbs([coeffs[i] for i in order])
            # keep as numpy: jit-captured DEVICE constants are fetched
            # back to host during lowering (slow/crashy via the tunnel);
            # numpy constants embed host-side.
            mats.append((rows, cols, cmat))
        self.mats = mats
        self._eval = jax.jit(self._eval_impl)

    def _eval_one(self, mat, witness):
        """witness: (n_limbs, num_vars, *batch) Montgomery limbs ->
        (n_limbs, num_constraints, *batch)."""
        rows, cols, coeffs = mat
        vals = jnp.take(witness, cols, axis=1)  # (L, nnz, *b)
        cshaped = coeffs.reshape(
            (FR.n, coeffs.shape[1]) + (1,) * (witness.ndim - 2)
        )
        prods = L.mont_mul(FR, vals, jnp.broadcast_to(cshaped, vals.shape))
        sums = jax.ops.segment_sum(
            jnp.moveaxis(prods, 1, 0),  # (nnz, L, *b)
            rows,
            num_segments=self.num_constraints,
        )
        sums = jnp.moveaxis(sums, 0, 1)  # (L, m, *b)
        # exact normalization then Montgomery-domain reduction mod p
        sums = L.normalize(sums, bound=1 << 19)
        return L.to_mont(FR, L.from_mont(FR, sums))

    def _eval_impl(self, witness):
        return tuple(self._eval_one(m, witness) for m in self.mats)

    def eval(self, witness):
        """-> (a_vals, b_vals, c_vals), each (L, m, *batch) Montgomery."""
        return self._eval(witness)
