"""Points-sharded MSM over a device mesh.

Each chip runs bucket accumulation over its local point/scalar shard; the
per-chip partial sums (single Jacobian points) are all-gathered over ICI
and tree-reduced locally — ~100 bytes of communication per chip per MSM,
so scaling is essentially linear in chips (BASELINE.json configs[3]).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ec import weierstrass as W
from ..ec.fields import FqOps
from ..msm import pippenger as pip


def sharded_msm_g1(points_jac, bits, mesh: Mesh, axis_name: str,
                   use_pippenger: bool | None = None):
    """points_jac: G1 Jacobian arrays batch (N,); bits (n_bits, N).

    N must divide evenly by the mesh axis size.  Returns a single Jacobian
    point (replicated)."""
    n = bits.shape[-1]
    n_dev = mesh.shape[axis_name]
    assert n % n_dev == 0
    if use_pippenger is None:
        use_pippenger = (n // n_dev) >= 64

    def local(pts, bits_l):
        if use_pippenger:
            partial_sum = pip.Msm(FqOps)._impl(pts, bits_l)
        else:
            # per-point double-and-add, then a scan-reduce over the local
            # points: exactly one add + one double graph instance, where
            # the tree reduce of pip._naive_msm_impl would clone the add
            # at log2(N) distinct shapes (XLA:CPU compiles each for ~min)
            muls = W.scalar_mul_bits(
                FqOps, (pts[0], pts[1]), bits_l
            )
            first = jax.tree.map(lambda a: a[..., 0], muls)
            rest = jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0)[1:], muls)

            def red(acc, nxt):
                return W.add(FqOps, acc, nxt), None

            partial_sum, _ = jax.lax.scan(red, first, rest)
        # gather the per-chip partial sums and reduce identically everywhere.
        # lax.scan keeps ONE point-add in the graph (an unrolled loop would
        # clone the add n_dev times — XLA:CPU compile time scales with it)
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis_name, axis=0),
            partial_sum,
        )  # leaves: (n_dev, ...)
        first = jax.tree.map(lambda a: a[0], gathered)
        rest = jax.tree.map(lambda a: a[1:], gathered)

        def body(acc, nxt):
            return W.add(FqOps, acc, nxt), None

        acc, _ = jax.lax.scan(body, first, rest)
        return acc

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            (P(None, axis_name),) * 3,
            P(None, axis_name),
        ),
        out_specs=(P(),) * 3,
        check_vma=False,
    )
    return fn(points_jac, bits)
