"""Points-sharded MSM over a device mesh.

Each chip runs bucket accumulation over its local point/scalar shard; the
per-chip partial sums (single Jacobian points) are all-gathered over ICI
and tree-reduced locally — ~100 bytes of communication per chip per MSM,
so scaling is essentially linear in chips (BASELINE.json configs[3]).

Proof-batch axes ride through: bits may be (n_bits, N, *B), in which case
the local shard runs the batched Pippenger kernel and the partial sums
carry the (*B) leaf batch.  Works for G1 (FqOps) and G2 (Fq2Ops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ec import weierstrass as W
from ..ec.fields import FqOps
from ..msm import pippenger as pip


def _pt_spec(field, spec):
    """PartitionSpec pytree matching a point tuple of the given field."""
    if field is FqOps:
        return (spec,) * 3
    return ((spec, spec),) * 3


def sharded_msm(field, points_jac, bits, mesh: Mesh, axis_name: str,
                use_pippenger: bool | None = None):
    """points_jac: Jacobian arrays batch (N,); bits (n_bits, N, *B).

    N must divide evenly by the mesh axis size.  Returns a single Jacobian
    point per batch element (replicated across the mesh)."""
    n = bits.shape[1]
    n_dev = mesh.shape[axis_name]
    assert n % n_dev == 0, (n, n_dev)
    if use_pippenger is None:
        use_pippenger = (n // n_dev) >= 64

    def local(pts, bits_l):
        if use_pippenger:
            partial_sum = pip.Msm(field)._impl(pts, bits_l)
        else:
            # per-point double-and-add, then a scan-reduce over the local
            # points: exactly one add + one double graph instance, where
            # a tree reduce would clone the add at log2(N) distinct
            # shapes (XLA:CPU compiles each for ~min)
            muls = W.scalar_mul_bits(field, (pts[0], pts[1]), bits_l)
            first = jax.tree.map(lambda a: a[..., 0], muls)
            rest = jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0)[1:], muls)

            def red(acc, nxt):
                return W.add(field, acc, nxt), None

            partial_sum, _ = jax.lax.scan(red, first, rest)
        # gather the per-chip partial sums and reduce identically
        # everywhere (lax.scan: ONE point-add instance in the graph)
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis_name, axis=0),
            partial_sum,
        )  # leaves: (n_dev, ...)
        first = jax.tree.map(lambda a: a[0], gathered)
        rest = jax.tree.map(lambda a: a[1:], gathered)

        def body(acc, nxt):
            return W.add(field, acc, nxt), None

        acc, _ = jax.lax.scan(body, first, rest)
        return acc

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            _pt_spec(field, P(None, axis_name)),
            P(None, axis_name),
        ),
        out_specs=_pt_spec(field, P()),
        check_vma=False,
    )
    return fn(points_jac, bits)


def sharded_msm_g1(points_jac, bits, mesh: Mesh, axis_name: str,
                   use_pippenger: bool | None = None):
    """G1 wrapper kept for the multichip dryrun / older callers."""
    return sharded_msm(FqOps, points_jac, bits, mesh, axis_name,
                       use_pippenger)


def sharded_suffix(msm, points_jac, digits, mesh: Mesh, axis_name: str):
    """The PRODUCTION suffix-MSM (msm/suffix.SuffixMsm) sharded over the
    chunk point axis.

    points_jac: Jacobian leaves (L, N); digits: (nw, N, *batch) raw
    digits in msm's encoding (signed for the prover).  Each chip sorts
    and suffix-scans its LOCAL N/n_dev point slice — the per-shard sort
    must be local because a global order would make every chip gather
    points cross-shard — and the per-window partial POINTS (leaves
    (L, nw, *batch), ~nw*B*96 ints, ~400 KB at the prover's shapes) are
    all-gathered over ICI and tree-reduced identically everywhere.
    Returns per-window totals exactly like msm.window_partials, so the
    chunk accumulate + single Horner combine in the pipeline are
    unchanged (SURVEY §2.4; greenfield — the reference has no
    multi-node MSM)."""
    n_dev = mesh.shape[axis_name]
    assert digits.shape[1] % n_dev == 0, (digits.shape, n_dev)
    F = msm.F

    def local(pts_l, dig_l):
        part = msm._partials(pts_l, dig_l)  # local sort + scan + gather
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis_name, axis=0), part
        )
        first = jax.tree.map(lambda a: a[0], gathered)
        rest = jax.tree.map(lambda a: a[1:], gathered)

        def body(acc, nxt):
            return W.add(F, acc, nxt), None

        acc, _ = jax.lax.scan(body, first, rest)
        return acc

    cache = getattr(msm, "_sharded_cache", None)
    if cache is None:
        cache = msm._sharded_cache = {}
    key = (mesh, axis_name)
    if key not in cache:
        cache[key] = jax.jit(shard_map(
            local,
            mesh=mesh,
            in_specs=(
                _pt_spec(F, P(None, axis_name)),
                P(None, axis_name),
            ),
            out_specs=_pt_spec(F, P()),
            check_vma=False,
        ))
    return cache[key](points_jac, digits)
