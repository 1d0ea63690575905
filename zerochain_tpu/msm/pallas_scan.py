"""Single-kernel, work-efficient prefix machinery for the suffix-sum MSM.

Round 3 ran the MSM prefix scan as ~11 unrolled Ladner-Fischer
fused-add pallas_calls of halving widths plus an 8-instance reduction
tree.  Every instance embeds its own ~100k-op Mosaic copy of the fused
Jacobian add, so the G1 MSM module carried ~20 kernel compiles (~380 s)
and the G2 one ~1000 s — the direct cause of the round-3 bench timeout
(BENCH_r03 rc=124: the driver wall fell during warm-up compile).

Design here (column-major two-phase scan):

  - Points are laid out column-major over VL = 8*128 = 1024 virtual
    lanes with depth T = N / 1024: logical sorted position i lives at
    (t, s, l) with t = i mod T, virtual lane vl = i div T = s*128 + l.
  - ONE pallas kernel per (window-group, proof) runs the depth scan
    entirely in VMEM: T-1 sequential full-rate (8, 128) adds, the add
    formula instantiated ONCE inside a fori_loop.  Work: N adds total —
    the same work-efficiency as LF, with zero inter-level HBM traffic.
  - The cross-lane combine (prefix over the 1024 virtual-lane totals)
    runs in XLA as a Hillis-Steele lax.scan of ONE fused-add instance
    (10 levels x width 1024 — negligible work, compile-compact).
  - Virtual-lane offsets are added only at the <= 255 GATHERED bucket
    positions, not across the whole array, so the combine costs O(nb)
    adds instead of another O(N) pass.

Net: ~2 Mosaic kernel instances per MSM module instead of ~20, and
~1N adds per scan instead of LF's 2N.

Semantics mirror bellman's multiexp bucket accumulation (SURVEY.md
§2.3); formulas are ec/pallas_ec.py's complete-by-masking Jacobian law
(reference: core/pairing/src/bls12_381/ec.rs:300-530).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ec.pallas_ec import _add_planes, _ctx, _fq2_ctx
from ..ff import limbs as L
from ..ff import pallas_ff as PF
from ..mirror.field import Q

FQ = L.FQ
LANES = 128
SUBLANES = 8
VL = SUBLANES * LANES  # virtual lanes of the column-major layout


def supported(n_elems: int) -> bool:
    """Column-scan constraint: N a pow2 multiple of the 1024 virtual
    lanes (T >= 2; T == 1 has no depth to scan — caller skips the
    kernel and scans the 1024 lanes in XLA directly)."""
    return (
        n_elems >= 2 * VL
        and (n_elems & (n_elems - 1)) == 0
    )


def logical_to_phys(i, n_elems: int):
    """Logical sorted position -> flat physical index (row-major over
    the (T, 8, 128) block): j = (i mod T) * 1024 + i div T."""
    t_depth = n_elems // VL
    return (i % t_depth) * VL + i // t_depth


def phys_perm(n_elems: int):
    """Index array p with p[j] = logical position stored at physical j."""
    t_depth = n_elems // VL
    j = jnp.arange(n_elems, dtype=jnp.int32)
    return (j % VL) * t_depth + j // VL


@functools.lru_cache(maxsize=None)
def _column_scan_kernel(ncomp: int, t_depth: int):
    """Build the depth-scan pallas_call for N = t_depth * 1024 points.

    In/out arrays: (n, M, T, 8, 128) int32 per point component; the
    kernel computes, in place (aliased outputs), the inclusive group
    prefix down the depth axis independently per (sublane, lane)."""
    n = FQ.n
    base = _ctx(n, Q)
    c = base if ncomp == 1 else _fq2_ctx(base)
    n_planes = 3 * ncomp * n

    one_mont = PF._limbs_of(pow(2, PF.LIMB_BITS * n, Q), n)

    def consts(shape):
        zero1 = [jnp.zeros(shape, jnp.int32)] * n
        onem1 = [jnp.full(shape, v, jnp.int32) for v in one_mont]
        if ncomp == 1:
            return onem1, zero1
        return (onem1, zero1), (zero1, [x for x in zero1])

    def _unflatten(planes):
        coords = []
        per = n * ncomp
        for i in range(3):
            chunk = planes[i * per : (i + 1) * per]
            if ncomp == 1:
                coords.append(list(chunk))
            else:
                coords.append((list(chunk[:n]), list(chunk[n:])))
        return tuple(coords)

    def _flatten(pt):
        out = []
        for coord in pt:
            if ncomp == 1:
                out.extend(coord)
            else:
                out.extend(coord[0])
                out.extend(coord[1])
        return out

    def kernel(*refs):
        ins, outs = refs[: 3 * ncomp], refs[3 * ncomp :]
        # copy input block into the (aliased) output block
        for iref, oref in zip(ins, outs):
            oref[...] = iref[...]
        onem, zero = consts((SUBLANES, LANES))

        def read_depth(t):
            planes = []
            for oref in outs:
                for k in range(n):
                    planes.append(oref[k, 0, t])
            return planes

        def write_depth(t, planes):
            i = 0
            for oref in outs:
                for k in range(n):
                    oref[k, 0, t] = planes[i]
                    i += 1

        def body(t, _):
            prev = _unflatten(read_depth(t - 1))
            cur = _unflatten(read_depth(t))
            res = _add_planes(c, prev, cur, onem, zero)
            write_depth(t, _flatten(res))
            return 0

        jax.lax.fori_loop(1, t_depth, body, 0)

    block = pl.BlockSpec(
        (n, 1, t_depth, SUBLANES, LANES), lambda i: (0, i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    @jax.jit
    def call(*args):
        m = args[0].shape[1]
        n_out = 3 * ncomp
        return pl.pallas_call(
            kernel,
            grid=(m,),
            in_specs=[block] * (3 * ncomp),
            out_specs=(block,) * n_out,
            out_shape=tuple(
                jax.ShapeDtypeStruct(args[0].shape, jnp.int32)
                for _ in range(n_out)
            ),
            # in-place: aliasing halves VMEM so the 8192-point G1 chunk
            # fits the 16 MB scoped-vmem budget
            input_output_aliases={i: i for i in range(n_out)},
            interpret=PF.INTERPRET,
        )(*args)

    return call


def column_scan(F, pts):
    """In-VMEM inclusive group prefix down the depth axis.

    pts: Jacobian point tuple in COLUMN-MAJOR physical order — leaves
    (L, *lead, N) with N = T*1024, element logical i at physical
    (i mod T)*1024 + i div T.  Returns prefixes in the same layout:
    physical (t, vl) holds the sum of logical vl*T .. vl*T+t."""
    ncomp = 1 if F.name == "fq" else 2
    leaves = []
    for coord in pts:
        if ncomp == 1:
            leaves.append(coord)
        else:
            leaves.extend(coord)
    shape = leaves[0].shape
    n = FQ.n
    N = shape[-1]
    t_depth = N // VL
    lead = shape[1:-1]
    m = 1
    for d in lead:
        m *= d

    call = _column_scan_kernel(ncomp, t_depth)
    tiled = [x.reshape(n, m, t_depth, SUBLANES, LANES) for x in leaves]
    outs = call(*tiled)
    outs = [o.reshape(shape) for o in outs]
    if ncomp == 1:
        return (outs[0], outs[1], outs[2])
    return (
        (outs[0], outs[1]), (outs[2], outs[3]), (outs[4], outs[5])
    )
