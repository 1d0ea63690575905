"""End-to-end TPU Groth16 prover for ConfidentialTransfer.

prove = compiled witness synthesis -> constraint matvec -> NTT quotient ->
MSMs -> on-device final assembly (A/B/C from alpha/beta/delta and r, s).
Everything stays on the device; the only host transfer is one flattened
batch of normalized proof points (the axon tunnel makes per-array fetches
expensive).  Mirrors bellman's create_random_proof pipeline (SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import g1 as jg1
from ..ec import g2 as jg2
from ..ec import weierstrass as W
from ..ec.fields import FqOps, Fq2Ops
from ..ff import limbs as L
from ..groth16 import domain as dom
from ..groth16.core import Parameters, Proof, _pad_input_constraints
from ..mirror.field import Q, R
from ..models.anonymous import AnonymousTransfer
from ..models.confidential import ConfidentialTransfer
from ..msm import pippenger as pip
from ..msm import suffix as smsm
from ..ntt import plan_for
from ..r1cs.system import ConstraintSystem
from .matvec import ConstraintMatrices
from . import witness as wit

FR = L.FR
FQ = L.FQ


@jax.jit
def _fetch_one(a):
    """One-element fetch used to force real device completion (cached
    jit: compiles once per input shape)."""
    return a.reshape(-1)[:1]


def _np_fq(v: int) -> np.ndarray:
    return L._int_to_limbs(v * FQ.r_mod_p % Q, FQ.n).reshape(FQ.n, 1)


def _np_g1(p):
    """Affine host point -> numpy Jacobian limb planes, batch (1,)."""
    if p is None:
        z = np.zeros((FQ.n, 1), np.int32)
        return (z, z.copy(), z.copy())
    return (_np_fq(p[0]), _np_fq(p[1]), _np_fq(1))


def _np_g2(p):
    if p is None:
        z = np.zeros((FQ.n, 1), np.int32)
        zz = (z, z.copy())
        return (zz, (z.copy(), z.copy()), (z.copy(), z.copy()))
    return (
        (_np_fq(p[0][0]), _np_fq(p[0][1])),
        (_np_fq(p[1][0]), _np_fq(p[1][1])),
        (_np_fq(1), _np_fq(0)),
    )


class ConfidentialProver:
    """Holds device-resident CRS + compiled kernels for batched proving.

    Subclasses rebind CIRCUIT/_witness_fns to prove other fixed circuits
    (AnonymousProver below) — the pipeline itself is circuit-agnostic."""

    CIRCUIT = ConfidentialTransfer

    @staticmethod
    def _witness_fns():
        """-> (witness_inputs_host, witness_jit) for this circuit."""
        return wit.witness_inputs_host, wit.confidential_witness_jit

    def __init__(self, params: Parameters | None, _device_queries=None,
                 _vk=None):
        cs = ConstraintSystem(track_names=False)
        self.CIRCUIT().synthesize(cs)
        _pad_input_constraints(cs)
        self.matrices = ConstraintMatrices(cs, cs.num_inputs)
        self.num_inputs = cs.num_inputs
        self.num_aux = len(cs.aux)
        self.m = cs.num_constraints
        self.d = dom.domain_size(self.m)
        self.plan = plan_for(self.d)

        if _device_queries is not None:
            vk = _vk
            self.params = None
            self.vk = vk
            raw = _device_queries
        else:
            self.params = params
            vk = params.vk
            self.vk = vk
            # device-resident CRS queries (None -> infinity, Z=0)
            raw = (
                jg1.from_affine_host(params.h),
                jg1.from_affine_host(params.l),
                jg1.from_affine_host(params.a),
                jg1.from_affine_host(params.b_g1),
                jg2.from_affine_host(params.b_g2),
            )
        self._raw_queries = raw  # pre-gather, for save_queries

        # numpy (host) constants: embed at lowering without device fetches
        self.alpha_g1 = _np_g1(vk.alpha_g1)
        self.beta_g1 = _np_g1(vk.beta_g1)
        self.delta_g1 = _np_g1(vk.delta_g1)
        self.beta_g2 = _np_g2(vk.beta_g2)
        self.delta_g2 = _np_g2(vk.delta_g2)

        # Density prefiltering (bellman's density-tracker equivalent): a
        # CRS query point is infinity exactly when the variable never
        # appears in that matrix's LCs, so those columns are dropped
        # statically and each MSM runs at its true dense size.
        self.a_cols = np.unique(self.matrices.mats[0][1])
        self.b_cols = np.unique(self.matrices.mats[1][1])

        # Bigger chunks amortize the MSM kernel's fixed per-program tail
        # (excl scan + gather + reduce ~ 21 formula apps vs T-1 for the
        # depth scan): T=16 runs ~30% fewer formula applications than
        # T=8 across the same points (see STATUS.md round-4 profile).
        # Capped by the domain size so tiny fixture circuits (MiniProver)
        # don't pad their MSMs out to 16k points.
        # T=32 chunks measured SLOWER on v5e despite the halved fixed
        # tail (L/H at 32768: 2.06 s vs 2x16384 at 1.98 s — the 26 MB
        # per-program scratch restricts Mosaic's DMA double-buffering),
        # so 16384 (T=16) stays the default everywhere.
        req_chunk = int(os.environ.get("ZEROCHAIN_MSM_CHUNK", "16384"))
        g2_cap = int(os.environ.get("ZEROCHAIN_MSM_CHUNK_G2", "16384"))
        d_pow2 = 1 << max(0, (self.d - 1).bit_length())
        self.msm_chunk_g1 = min(req_chunk, max(1024, d_pow2))

        # Per-MSM chunks: padding a query out to a bigger chunk than its
        # pow2-ceil size makes the depth scan run DEAD points (b_cols ~
        # 12.4k padded to 32768 would double the B1 scan), so each query
        # gets min(req, pow2ceil(n)).  B1 (G1) and B2 (G2) must MATCH to
        # share their digit sort, so both take the G2 VMEM cap (T=16
        # measured safe; T=32 G2 scratch ~50 MB is past the budget).
        def chunk_for(n_pts, cap):
            p = 1 << max(0, (max(1, n_pts) - 1).bit_length())
            return max(min(1024, self.msm_chunk_g1),
                       min(cap, self.msm_chunk_g1, p))

        self.msm_chunk_b = chunk_for(len(self.b_cols), g2_cap)
        self.msm_chunk_g2 = self.msm_chunk_b
        self.serialize_chunks = bool(
            int(os.environ.get("ZEROCHAIN_SERIALIZE_CHUNKS", "1"))
        )
        self.msm_chunk_a = chunk_for(len(self.a_cols), req_chunk)
        self.msm_chunk_l = chunk_for(self.num_aux, req_chunk)
        self.msm_chunk_h = chunk_for(self.d, req_chunk)

        h_raw, l_raw, a_raw, b1_raw, b2_raw = raw
        self.h_pts, self.size_h = self._prep(h_raw, None, self.d,
                                             self.msm_chunk_h)
        self.l_pts, self.size_l = self._prep(l_raw, None, self.num_aux,
                                             self.msm_chunk_l)
        self.a_pts, self.size_a = self._prep(a_raw, self.a_cols, None,
                                             self.msm_chunk_a)
        self.b1_pts, self.size_b1 = self._prep(b1_raw, self.b_cols, None,
                                               self.msm_chunk_b)
        self.b2_pts, self.size_b2 = self._prep(b2_raw, self.b_cols, None,
                                               self.msm_chunk_g2)

        # Pre-slice the CRS chunk views ONCE: an eager slice per chunk per
        # prove costs a tunnel round trip (~0.5s each through the axon
        # worker — measured to dominate the whole proving wall time).
        def chunks_of(pts, size, chunk):
            return [
                pip.tmap(lambda a: a[..., off : off + chunk], pts)
                for off in range(0, size, chunk)
            ]

        self.a_chunks = chunks_of(self.a_pts, self.size_a, self.msm_chunk_a)
        self.b1_chunks = chunks_of(self.b1_pts, self.size_b1,
                                   self.msm_chunk_b)
        self.b2_chunks = chunks_of(self.b2_pts, self.size_b2,
                                   self.msm_chunk_g2)
        self.l_chunks = chunks_of(self.l_pts, self.size_l, self.msm_chunk_l)
        self.h_chunks = chunks_of(self.h_pts, self.size_h, self.msm_chunk_h)

        # MSM implementation: 'suffix' (default; sort + Ladner-Fischer
        # prefix scan, ~2N adds/window, one window combine per MSM —
        # msm/suffix.py) or 'hs' (round-2 Hillis-Steele segmented scan,
        # N·log N adds/window and a window combine per CHUNK).
        self.msm_impl = os.environ.get("ZEROCHAIN_MSM_IMPL", "suffix")
        if self.msm_impl == "suffix":
            # c=8 balances window count against the kernel's one-hot
            # gather (slot rows x depth dots grow with 2^c x T; c=10's
            # -19% windows loses to its 4x phase-C work at T=16).
            # signed=True: |digit| <= 128 halves the bucket slots (one
            # 128-lane row), halving phase C/D of the totals kernel.
            suffix_c = int(os.environ.get("ZEROCHAIN_MSM_SUFFIX_C", "8"))
            self.msm_g1 = smsm.SuffixMsm(FqOps, c=suffix_c, signed=True)
            self.msm_g2 = smsm.SuffixMsm(Fq2Ops, c=suffix_c, signed=True)
        else:
            # per-group scan-mode knobs: 'assoc' costs ~log2(N) extra
            # Mosaic kernel compiles but ~6.5x fewer point-adds
            self.msm_g1 = pip.Msm(
                FqOps, mode=os.environ.get("ZEROCHAIN_MSM_SCAN_G1") or None
            )
            self.msm_g2 = pip.Msm(
                Fq2Ops, mode=os.environ.get("ZEROCHAIN_MSM_SCAN_G2") or None
            )
        self._assemble = jax.jit(self._assemble_impl)
        self._quotient = jax.jit(self._quotient_impl)
        self._digits = jax.jit(self._digits_impl)

        # multi-chip: shard each MSM chunk's points over the mesh with an
        # all-gathered partial-sum reduction (dist/msm.py).  Opt-in via
        # ZEROCHAIN_DIST=1 on a multi-device runtime; chunk sizes must
        # divide by the device count (16384/8192 do for 2/4/8 chips).
        # The PRODUCTION suffix path shards directly (each chip sorts and
        # scans its local point slice, per-window partial points are
        # all-gathered and tree-reduced — dist/msm.py:sharded_suffix);
        # the round-4 silent downgrade to the round-2 'hs' kernels is
        # gone.
        self.mesh = None
        if int(os.environ.get("ZEROCHAIN_DIST", "0")):
            devs = jax.devices()
            if len(devs) > 1:
                from jax.sharding import Mesh

                self.mesh = Mesh(np.asarray(devs), ("pt",))

    def _prep(self, pts, cols, n, chunk):
        """Gather dense columns, pad to a chunk multiple, and NORMALIZE
        to affine (Z in {0, one}); -> (pts, size).

        The normalization is load-bearing: the MSM depth-scan kernels
        use the mixed add (_madd_planes, Z2 in {0, 1}) on the incoming
        CRS point, but from_toxic_waste/from_cache queries arrive as
        arbitrary-Z Jacobians from the fixed-base exponentiation.  One
        batched inversion per query array at init makes every chunk
        madd-eligible (and the points canonical for caching)."""
        if cols is not None:
            pts = pip.tmap(lambda a: jnp.take(a, cols, axis=-1), pts)
            n = len(cols)
        size = -(-n // chunk) * chunk

        def pad(a):
            cur = a.shape[-1]
            if cur >= size:
                return a[..., :size]
            z = jnp.zeros(a.shape[:-1] + (size - cur,), a.dtype)
            return jnp.concatenate([a, z], axis=-1)

        pts = pip.tmap(pad, pts)
        field = Fq2Ops if isinstance(pts[0], tuple) else FqOps

        @jax.jit
        def to_affine_z01(p):
            x, y, inf = W.normalize(field, p)
            batch = field.batch_shape(x)
            zero = field.zeros(batch)
            z = field.select(inf, zero, field.ones(batch))
            return (x, y, z)

        return to_affine_z01(pts), size

    @staticmethod
    def _pad_bits(bits, n):
        """Pad the point axis (axis 1) of (n_bits, N, B) bits to n."""
        cur = bits.shape[1]
        if cur >= n:
            return bits[:, :n]
        z = jnp.zeros(
            (bits.shape[0], n - cur) + bits.shape[2:], bits.dtype
        )
        return jnp.concatenate([bits, z], axis=1)

    def _msm_chunked(self, field, pts, bits, size):
        """Batched MSM in fixed-size point chunks; the proof-batch axis B
        rides through every chunk kernel (bits (n_bits, N, B)) and the
        partial Jacobian sums (leaf batch (B,)) are added."""
        if field is FqOps:
            chunk, msm, addp = self.msm_chunk_g1, self.msm_g1, jg1.add
        else:
            chunk, msm, addp = self.msm_chunk_g2, self.msm_g2, jg2.add
        acc = None
        for off in range(0, size, chunk):
            chunk_pts = pip.tmap(lambda a: a[..., off : off + chunk], pts)
            chunk_bits = bits[:, off : off + chunk]
            if self.mesh is not None:
                from ..dist.msm import sharded_msm

                part = sharded_msm(field, chunk_pts, chunk_bits,
                                   self.mesh, "pt")
            else:
                part = msm(chunk_pts, chunk_bits)
            acc = part if acc is None else addp(acc, part)
            if self.serialize_chunks:
                # serialize: unbounded async queueing of chunk executions
                # overlaps their HBM temps and can crash the worker
                jax.tree_util.tree_leaves(acc)[0].block_until_ready()
        return acc

    @staticmethod
    def _true_sync(x, label=""):
        """Force REAL device completion by fetching one element.

        block_until_ready through the tunneled worker has been observed
        returning early, which makes stage marks fiction; a value fetch
        cannot lie.  Costs ~25 ms tunnel round trip per call — only for
        ZEROCHAIN_STAGE_SYNC=1 diagnosis runs.  The fetch jit is cached
        at module scope: a fresh jit(lambda) per call recompiles the
        fetch (~1 s each through the axon compile helper) and poisons
        every stage measurement."""
        if not int(os.environ.get("ZEROCHAIN_STAGE_SYNC", "0")):
            return
        import sys as _s
        import time as _t

        t0 = _t.time()
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(_fetch_one(leaf))
        print(f"#   sync[{label}] +{_t.time()-t0:.2f}s", file=_s.stderr,
              flush=True)

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _acc_add_jit(field):
        """Jitted per-window partial accumulate (fused kernels forced:
        (nw, B) batches sit under the Pallas batch heuristic)."""
        from ..ff import pallas_ff as PF

        def f(a, b):
            with PF.forced():
                return W.add(field, a, b)

        return jax.jit(f)

    def _msm_chunked_suffix(self, field, pts_chunks, prep_chunks):
        """Suffix-MSM chunk loop over PRE-SLICED point chunks and digit
        preps: one jit dispatch per chunk + one accumulate + one combine
        — no eager ops (each costs a tunnel round trip), and the Horner
        window combine runs ONCE per MSM.

        In dist mode (self.mesh) prep_chunks are RAW digit chunks and
        each chunk's points/digits are sharded over the mesh point axis
        (dist/msm.py:sharded_suffix): per-chip local sort + scan, one
        all-gather of (nw, B) partial points per chunk."""
        msm = self.msm_g1 if field is FqOps else self.msm_g2
        acc = None
        for cpts, cprep in zip(pts_chunks, prep_chunks):
            if self.mesh is not None:
                from ..dist.msm import sharded_suffix

                part = sharded_suffix(msm, cpts, cprep, self.mesh, "pt")
            else:
                part = msm.window_partials(cpts, prep=cprep)
            acc = part if acc is None else self._acc_add_jit(field)(acc, part)
            if self.serialize_chunks:
                jax.tree_util.tree_leaves(acc)[0].block_until_ready()
            self._true_sync(acc, "chunk")
        out = msm.combine(acc)
        self._true_sync(out, "combine")
        return out

    @classmethod
    def from_toxic_waste(cls, tau, alpha, beta, gamma, delta,
                         chunk: int = 4096, chunk_g2: int = 1024):
        """Generate the CRS directly on device (no host point round trip —
        host<->device transfers through the tunnel are the slow path).
        Query points stay as device Jacobian arrays; only the small vk/ic
        goes through host bigints."""
        from ..groth16.core import crs_exponents, vk_from_exponents
        from ..mirror import curves as cv

        exps = crs_exponents(
            cls.CIRCUIT(), tau, alpha, beta, gamma, delta
        )
        vk = vk_from_exponents(exps)

        fb1 = pip.FixedBaseMsm(FqOps, cv.G1_GEN)
        fb2 = pip.FixedBaseMsm(Fq2Ops, cv.G2_GEN)

        def dev(fb, exp_list, ch):
            """Chunked fixed-base exponentiation; the window-gather temp is
            (n_windows*chunk) wide, so the chunk bounds HBM temp usage."""
            parts = []
            for off in range(0, len(exp_list), ch):
                part = exp_list[off : off + ch]
                part = part + [0] * (ch - len(part))
                parts.append(fb(pip.scalars_to_bits(part, 255)))
            n = len(exp_list)
            cat = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=-1)[..., :n], *parts
            )
            return cat

        queries = (
            dev(fb1, exps["h"], chunk),
            dev(fb1, exps["l"], chunk),
            dev(fb1, exps["u"], chunk),
            dev(fb1, exps["v"], chunk),
            dev(fb2, exps["v"], chunk_g2),
        )
        return cls(None, _device_queries=queries, _vk=vk)

    # ------------------------------------------------------------------
    def save_queries(self, path: str) -> None:
        """Persist the device CRS queries + vk to an .npz so later runs
        skip the ~4 min on-device CRS generation (bellman's analogue is
        Parameters::write, core/proofs/src/confidential.rs:73-103 — here
        the cache holds raw device limb planes instead of affine bytes)."""
        from ..groth16.serialization import vk_to_bytes

        flatten = jax.jit(lambda a: a.reshape(-1))

        def fetch(a):
            # 1-D flatten on device first: 2-D buffers take a pathological
            # element-wise path through the tunnel (STATUS.md round 1)
            return np.asarray(flatten(a)).reshape(a.shape)

        def flat(prefix, pts):
            out = {}
            for name, comp in zip(("x", "y", "z"), pts):
                if isinstance(comp, tuple):
                    out[f"{prefix}_{name}0"] = fetch(comp[0])
                    out[f"{prefix}_{name}1"] = fetch(comp[1])
                else:
                    out[f"{prefix}_{name}"] = fetch(comp)
            return out

        h_raw, l_raw, a_raw, b1_raw, b2_raw = self._raw_queries
        arrs = {}
        for prefix, pts in (
            ("h", h_raw), ("l", l_raw), ("a", a_raw),
            ("b1", b1_raw), ("b2", b2_raw),
        ):
            arrs.update(flat(prefix, pts))
        arrs["vk"] = np.frombuffer(vk_to_bytes(self.vk), dtype=np.uint8)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrs)
        os.replace(tmp, path)

    @classmethod
    def from_cache(cls, path: str) -> "ConfidentialProver":
        """Load a CRS previously written by save_queries."""
        from ..groth16.serialization import vk_from_bytes

        with np.load(path) as z:
            def pt(prefix, g2=False):
                if g2:
                    return tuple(
                        (jnp.asarray(z[f"{prefix}_{n}0"]),
                         jnp.asarray(z[f"{prefix}_{n}1"]))
                        for n in ("x", "y", "z")
                    )
                return tuple(
                    jnp.asarray(z[f"{prefix}_{n}"]) for n in ("x", "y", "z")
                )

            queries = (
                pt("h"), pt("l"), pt("a"), pt("b1"), pt("b2", g2=True)
            )
            vk = vk_from_bytes(z["vk"].tobytes())
        return cls(None, _device_queries=queries, _vk=vk)

    # ------------------------------------------------------------------
    def _quotient_impl(self, aux, public):
        """One jit for the whole front half after witness synthesis:
        witness concat + quotient NTTs (every eager op between jits costs
        a tunnel round trip)."""
        witness_mont = jnp.concatenate([public, aux], axis=1)
        return witness_mont, self._h_scalars(witness_mont)

    def _digits_impl(self, witness_mont, h_scalars):
        """All five MSMs' per-chunk digit preps in ONE jit.

        Returns per-MSM lists of (sorted_digits, order) ready for
        window_partials(prep=...).  The B1 (G1) and B2 (G2) MSMs run
        over IDENTICAL scalars; when their chunk sizes match (default)
        they share the same preps — one digit sort instead of two
        (bellman sorts nothing; this is the TPU design's analogue of
        its shared density map, multiexp.rs via SURVEY §2.3).

        In dist mode the raw signed digit chunks are returned instead:
        each chip must sort only its LOCAL point slice (a global sort
        order would make every chip gather points cross-shard)."""
        wit_canon = L.from_mont(FR, witness_mont)
        h_canon = L.from_mont(FR, h_scalars)

        def digs(limbs, msm, size, chunk):
            d = msm.digits(limbs)
            d = self._pad_bits(d, size)
            return [d[:, off : off + chunk]
                    for off in range(0, size, chunk)]

        g1, g2 = self.msm_g1, self.msm_g2
        a_d = digs(wit_canon[:, self.a_cols], g1, self.size_a,
                   self.msm_chunk_a)
        b1_d = digs(wit_canon[:, self.b_cols], g1, self.size_b1,
                    self.msm_chunk_b)
        l_d = digs(wit_canon[:, self.num_inputs :], g1, self.size_l,
                   self.msm_chunk_l)
        h_d = digs(h_canon, g1, self.size_h, self.msm_chunk_h)
        share_b = (self.msm_chunk_g2 == self.msm_chunk_b
                   and g2.c == g1.c and g2.signed == g1.signed)
        b2_d = (b1_d if share_b
                else digs(wit_canon[:, self.b_cols], g2, self.size_b2,
                          self.msm_chunk_g2))
        if self.mesh is not None:
            return (a_d, b1_d, b2_d, l_d, h_d)
        a_p = [g1._prep(d) for d in a_d]
        b1_p = [g1._prep(d) for d in b1_d]
        b2_p = b1_p if share_b else [g2._prep(d) for d in b2_d]
        l_p = [g1._prep(d) for d in l_d]
        h_p = [g1._prep(d) for d in h_d]
        return (a_p, b1_p, b2_p, l_p, h_p)

    def _h_scalars(self, witness_mont):
        """witness (L, n_vars, B) -> quotient coeffs (L, d-1, B) mont.

        In dist mode the whole intt -> coset_ntt -> pointwise ->
        divide-by-z -> icoset_ntt chain runs as four-step distributed
        transforms with all_to_all stage exchange over the mesh
        (dist/ntt.DistNtt.quotient; BASELINE configs[4])."""
        a_v, b_v, c_v = self.matrices.eval(witness_mont)
        B = witness_mont.shape[-1]
        pad = self.d - self.m

        def pad_to_d(x):
            z = jnp.zeros((FR.n, pad, B), jnp.int32)
            return jnp.moveaxis(
                jnp.concatenate([x, z], axis=1), 1, -1
            )  # (L, B, d)

        n_dev = 0 if self.mesh is None else self.mesh.shape["pt"]
        if self.mesh is not None and self.d >= n_dev * n_dev * 2:
            from ..dist.ntt import dist_plan_for

            dn = dist_plan_for(self.d, self.mesh, "pt")
            h = dn.quotient(
                pad_to_d(a_v), pad_to_d(b_v), pad_to_d(c_v)
            )
        else:
            a_c = self.plan.coset_ntt(self.plan.intt(pad_to_d(a_v)))
            b_c = self.plan.coset_ntt(self.plan.intt(pad_to_d(b_v)))
            c_c = self.plan.coset_ntt(self.plan.intt(pad_to_d(c_v)))
            q = L.sub(FR, L.mont_mul(FR, a_c, b_c), c_c)
            q = self.plan.divide_by_z_on_coset(q)
            h = self.plan.icoset_ntt(q)  # (L, B, d)
        h = jnp.moveaxis(h, -1, 1)[:, : self.d - 1]  # (L, d-1, B)
        return h

    # ------------------------------------------------------------------
    def _assemble_impl(self, a_acc, b1_acc, b2_acc, l_acc, h_acc,
                       r_bits, s_bits, rs_bits):
        """Per-proof accumulators (leaf batch (B,)) + r/s/(r*s) bits
        (255, B) -> normalized affine proof coordinates, one flat int32
        vector.

        The six double-and-add chains of the round-2 version are batched
        into THREE 255-step scans: {r,s,r*s}*delta1 ride one G1 scan
        (r*s is computed host-side so the chains stay independent),
        {s*A, r*B1} a second, s*delta2 the G2 one."""
        from ..ff import pallas_ff as PF

        with PF.forced():
            return self._assemble_body(
                a_acc, b1_acc, b2_acc, l_acc, h_acc, r_bits, s_bits, rs_bits
            )

    def _assemble_body(self, a_acc, b1_acc, b2_acc, l_acc, h_acc,
                       r_bits, s_bits, rs_bits):
        B = r_bits.shape[1]

        def bcast_g1(p, k=None):
            shape = ((B,) if k is None else (k, B))
            return pip.tmap(
                lambda a: jnp.broadcast_to(
                    a.reshape(a.shape[0], *([1] * len(shape))),
                    (a.shape[0], *shape)
                ), p
            )

        def bcast_g2(p):
            return pip.tmap(
                lambda a: (
                    tuple(jnp.broadcast_to(c, c.shape[:-1] + (B,)) for c in a)
                    if isinstance(a, tuple) else
                    jnp.broadcast_to(a, a.shape[:-1] + (B,))
                ),
                p,
            )

        # scan 1: {r, s, rs} * delta1 in one (3, B)-wide G1 chain
        rss_bits = jnp.stack([r_bits, s_bits, rs_bits], axis=1)  # (255,3,B)
        deltas = W.scalar_mul_bits_jac(
            FqOps, bcast_g1(self.delta_g1, 3), rss_bits
        )
        r_delta1 = pip.tmap(lambda a: a[..., 0, :], deltas)
        s_delta1 = pip.tmap(lambda a: a[..., 1, :], deltas)
        rs_delta = pip.tmap(lambda a: a[..., 2, :], deltas)
        s_delta2 = W.scalar_mul_bits_jac(Fq2Ops, bcast_g2(self.delta_g2), s_bits)

        # A = alpha + sum_a + r*delta
        g_a = W.add(FqOps, bcast_g1(self.alpha_g1), a_acc)
        g_a = W.add(FqOps, g_a, r_delta1)
        # B = beta + sum_b2 + s*delta (G2)
        g_b = W.add(Fq2Ops, bcast_g2(self.beta_g2), b2_acc)
        g_b = W.add(Fq2Ops, g_b, s_delta2)
        # B1 = beta1 + sum_b1 + s*delta1
        b1_full = W.add(FqOps, bcast_g1(self.beta_g1), b1_acc)
        b1_full = W.add(FqOps, b1_full, s_delta1)
        # scan 2: C = s*A + r*B1 - rs*delta + l + h
        ab1 = jax.tree.map(
            lambda x, y: jnp.stack([x, y], axis=1), g_a, b1_full
        )
        sr_bits = jnp.stack([s_bits, r_bits], axis=1)  # (255, 2, B)
        muls = W.scalar_mul_bits_jac(FqOps, ab1, sr_bits)
        sA = pip.tmap(lambda a: a[..., 0, :], muls)
        rB1 = pip.tmap(lambda a: a[..., 1, :], muls)
        g_c = W.add(FqOps, sA, rB1)
        g_c = W.add(FqOps, g_c, W.neg(FqOps, rs_delta))
        g_c = W.add(FqOps, g_c, l_acc)
        g_c = W.add(FqOps, g_c, h_acc)

        ax, ay, _ = W.normalize(FqOps, g_a)
        cx, cy, _ = W.normalize(FqOps, g_c)
        (bx0, bx1), (by0, by1), _ = W.normalize(Fq2Ops, g_b)
        flat = jnp.concatenate(
            [x.reshape(-1) for x in (ax, ay, cx, cy, bx0, bx1, by0, by1)]
        )
        return flat

    # ------------------------------------------------------------------
    def warm_parallel(self, assignments: list[dict]) -> None:
        """Compile every jit of the proving pipeline CONCURRENTLY.

        A serial first prove() pays each module's compile back-to-back
        (~1400 s cold at B=32: G2 MSM ~650 s + G1 ~290 s + witness +
        quotient + assemble...).  The axon compile helper runs one
        subprocess per request, so issuing all modules from threads
        overlaps them and the cold wall drops to ~the slowest single
        compile.  Dummy zero-valued inputs are used with EXACTLY the
        shapes prove() dispatches, so the in-process jit caches hit."""
        import concurrent.futures as cf

        B = len(assignments)
        inputs_host, witness_jit = self._witness_fns()
        inputs = inputs_host(assignments)
        n_vars = self.num_inputs + self.num_aux
        z = lambda *s: jnp.zeros(s, jnp.int32)  # noqa: E731

        def wit():
            aux, public = witness_jit(**inputs)
            jax.tree_util.tree_leaves(aux)[0].block_until_ready()

        def quo():
            wm, h = self._quotient(
                z(FR.n, self.num_aux, B), z(FR.n, self.num_inputs, B)
            )
            h.block_until_ready()

        def digs():
            out = self._digits(z(FR.n, n_vars, B), z(FR.n, self.d - 1, B))
            jax.tree_util.tree_leaves(out)[0].block_until_ready()

        def msm(field):
            if field is FqOps:
                m, chunks, chunk = (
                    self.msm_g1, self.a_chunks, self.msm_chunk_a
                )
            else:
                m, chunks, chunk = (
                    self.msm_g2, self.b2_chunks, self.msm_chunk_g2
                )
            part = m.window_partials(
                chunks[0],
                prep=(z(m.n_windows, B, chunk), z(m.n_windows, B, chunk)),
            )
            acc = self._acc_add_jit(field)(part, part)
            out = m.combine(acc)
            jax.tree_util.tree_leaves(out)[0].block_until_ready()
            return out

        def assemble():
            g1pt = tuple(z(FQ.n, B) for _ in range(3))
            g2pt = tuple(
                (z(FQ.n, B), z(FQ.n, B)) for _ in range(3)
            )
            bits = z(255, B)
            flat = self._assemble(
                g1pt, g1pt, g2pt, g1pt, g1pt, bits, bits, bits
            )
            flat.block_until_ready()

        jobs = [wit, quo, digs, lambda: msm(FqOps), lambda: msm(Fq2Ops),
                assemble]
        with cf.ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            futures = [ex.submit(j) for j in jobs]
            for f in futures:
                f.result()  # re-raise any compile failure

    def prove(self, assignments: list[dict], rs=None) -> list[Proof]:
        """assignments: per-proof witness dicts (witness_inputs_host).

        Set ZEROCHAIN_TRACE=<dir> for an xprof device trace of the run;
        stage wall-times land in ``self.last_timings`` either way."""
        from ..utils.profiling import device_trace, trace_dir_from_env

        with device_trace(trace_dir_from_env()):
            return self._prove_impl(assignments, rs)

    def _prove_impl(self, assignments: list[dict], rs=None) -> list[Proof]:
        import sys as _sys
        import time as _time

        from ..utils.profiling import (
            StageRecorder, device_trace, trace_dir_from_env,
        )

        rec = StageRecorder()
        self.last_timings = rec.timings  # live view; populated below

        def _mark(msg, _t0=[_time.time()]):
            rec.mark(msg.replace(" done", "").replace(" ", "_"))
            print(f"# prove +{_time.time()-_t0[0]:.1f}s: {msg}",
                  file=_sys.stderr, flush=True)

        B = len(assignments)
        inputs_host, witness_jit = self._witness_fns()
        inputs = inputs_host(assignments)
        aux, public = witness_jit(**inputs)
        jax.tree_util.tree_leaves(aux)[0].block_until_ready()
        self._true_sync(aux, "witness")
        _mark("witness done")

        # all five MSMs carry the whole proof batch B in one kernel pass
        # (the reference's bellman loops per proof; SURVEY.md §3.2) and
        # run at their dense (density-gathered) sizes
        if self.msm_impl == "suffix":
            witness_mont, h_scalars = self._quotient(aux, public)
            self._true_sync(h_scalars, "quotient")
            _mark("quotient (NTT) done")
            # preps (single-chip) or raw digit chunks (dist) — see
            # _digits_impl; B1/B2 entries alias one shared sort
            ap, b1p, b2p, lp, hp = self._digits(witness_mont, h_scalars)
            a_acc = self._msm_chunked_suffix(FqOps, self.a_chunks, ap)
            _mark("msm A done")
            b1_acc = self._msm_chunked_suffix(FqOps, self.b1_chunks, b1p)
            b2_acc = self._msm_chunked_suffix(Fq2Ops, self.b2_chunks, b2p)
            _mark("msm B1/B2 done")
            l_acc = self._msm_chunked_suffix(FqOps, self.l_chunks, lp)
            h_acc = self._msm_chunked_suffix(FqOps, self.h_chunks, hp)
        else:
            witness_mont = jnp.concatenate([public, aux], axis=1)
            h_scalars = self._h_scalars(witness_mont)
            h_scalars.block_until_ready()
            _mark("quotient (NTT) done")
            wit_canon = L.from_mont(FR, witness_mont)
            h_canon = L.from_mont(FR, h_scalars)
            wit_bits = pip.limbs_to_bits(wit_canon, 255)  # (255, n_vars, B)
            h_bits = pip.limbs_to_bits(h_canon, 255)
            ab = self._pad_bits(wit_bits[:, self.a_cols], self.size_a)
            bb = self._pad_bits(wit_bits[:, self.b_cols], self.size_b1)
            bb2 = self._pad_bits(wit_bits[:, self.b_cols], self.size_b2)
            lb = self._pad_bits(wit_bits[:, self.num_inputs :], self.size_l)
            hb = self._pad_bits(h_bits, self.size_h)
            run = self._msm_chunked
            a_acc = run(FqOps, self.a_pts, ab, self.size_a)
            _mark("msm A done")
            b1_acc = run(FqOps, self.b1_pts, bb, self.size_b1)
            b2_acc = run(Fq2Ops, self.b2_pts, bb2, self.size_b2)
            _mark("msm B1/B2 done")
            l_acc = run(FqOps, self.l_pts, lb, self.size_l)
            h_acc = run(FqOps, self.h_pts, hb, self.size_h)

        if rs is None:
            rs = [
                (
                    int.from_bytes(os.urandom(32), "little") % R,
                    int.from_bytes(os.urandom(32), "little") % R,
                )
                for _ in range(B)
            ]
        r_bits = pip.scalars_to_bits([r for r, _ in rs], 255)
        s_bits = pip.scalars_to_bits([s for _, s in rs], 255)
        rs_bits = pip.scalars_to_bits([r * s % R for r, s in rs], 255)

        _mark("msms done")
        if os.environ.get("ZEROCHAIN_HOST_ASSEMBLE"):
            return self._host_assemble(
                a_acc, b1_acc, b2_acc, l_acc, h_acc, rs, B
            )
        flat = self._assemble(
            a_acc, b1_acc, b2_acc, l_acc, h_acc, r_bits, s_bits, rs_bits
        )
        flat.block_until_ready()
        _mark("assemble done")
        host = np.asarray(flat).reshape(8, FQ.n, B)

        proofs = []
        for b in range(B):
            vals = [
                L.from_limbs(FQ, host[i, :, b : b + 1], mont=True)[0]
                for i in range(8)
            ]
            ax, ay, cx, cy, bx0, bx1, by0, by1 = vals
            proofs.append(
                Proof(
                    a=(ax, ay),
                    b=((bx0, bx1), (by0, by1)),
                    c=(cx, cy),
                )
            )
        return proofs

    def _host_assemble(self, a_acc, b1_acc, b2_acc, l_acc, h_acc, rs, B):
        """Fallback: fetch the five MSM accumulators (one flat transfer)
        and assemble A/B/C with host bigints (mirror)."""
        from ..mirror import curves as cv
        from ..mirror.field import R as _R

        g1_flat = jnp.concatenate(
            [jnp.stack(p, axis=0).reshape(-1)  # (3, FQ.n, B) flattened
             for p in (a_acc, b1_acc, l_acc, h_acc)]
        )
        g2_flat = jnp.concatenate(
            [jnp.stack([c for comp in b2_acc for c in comp], axis=0)
             .reshape(-1)]
        )
        g1_host = np.asarray(g1_flat).reshape(4, 3, FQ.n, B)
        g2_host = np.asarray(g2_flat).reshape(6, FQ.n, B)

        def g1_point(arr3, b):
            x, y, z = (
                L.from_limbs(FQ, arr3[i, :, b : b + 1], mont=True)[0]
                for i in range(3)
            )
            if z == 0:
                return None
            from ..mirror.field import Q as _Q

            zi = pow(z, _Q - 2, _Q)
            zi2 = zi * zi % _Q
            return (x * zi2 % _Q, y * zi2 % _Q * zi % _Q)

        def g2_point(arr6, b):
            from ..mirror.field import Q as _Q
            from ..mirror.field import fq2_inv, fq2_mul, fq2_sqr

            vals = [
                L.from_limbs(FQ, arr6[i, :, b : b + 1], mont=True)[0]
                for i in range(6)
            ]
            x = (vals[0], vals[1])
            y = (vals[2], vals[3])
            z = (vals[4], vals[5])
            if z == (0, 0):
                return None
            zi = fq2_inv(z)
            zi2 = fq2_sqr(zi)
            return (fq2_mul(x, zi2), fq2_mul(fq2_mul(y, zi2), zi))

        vk = self.vk
        proofs = []
        for b in range(B):
            a_pt = g1_point(g1_host[0], b)
            b1_pt = g1_point(g1_host[1], b)
            l_pt = g1_point(g1_host[2], b)
            h_pt = g1_point(g1_host[3], b)
            b2_pt = g2_point(g2_host, b)
            r, s = rs[b]
            g_a = cv.g1_add(
                cv.g1_add(vk.alpha_g1, a_pt), cv.g1_mul(vk.delta_g1, r)
            )
            g_b = cv.g2_add(
                cv.g2_add(vk.beta_g2, b2_pt), cv.g2_mul(vk.delta_g2, s)
            )
            b1_full = cv.g1_add(
                cv.g1_add(vk.beta_g1, b1_pt), cv.g1_mul(vk.delta_g1, s)
            )
            g_c = cv.g1_mul(g_a, s)
            g_c = cv.g1_add(g_c, cv.g1_mul(b1_full, r))
            g_c = cv.g1_add(
                g_c, cv.g1_neg(cv.g1_mul(vk.delta_g1, r * s % _R))
            )
            g_c = cv.g1_add(g_c, l_pt)
            g_c = cv.g1_add(g_c, h_pt)
            proofs.append(Proof(a=g_a, b=g_b, c=g_c))
        return proofs

    def public_inputs(self, assignments: list[dict]) -> list[list[int]]:
        """The runtime public inputs per proof (without ONE): 22 for
        confidential, 104 for anonymous (modules/zk-system/src/lib.rs:22-23)."""
        inputs_host, witness_jit = self._witness_fns()
        inputs = inputs_host(assignments)
        _, public = witness_jit(**inputs)
        # flatten on device first: 1-D buffers take the fast transfer path
        flat = jax.jit(lambda a: a.reshape(-1))(public)
        pub = np.asarray(flat).reshape(public.shape)
        out = []
        for b in range(len(assignments)):
            vals = L.from_limbs(FR, pub[:, :, b], mont=True)
            out.append(vals[1:])
        return out


class AnonymousProver(ConfidentialProver):
    """TPU Groth16 prover for the AnonymousTransfer circuit (~50k
    constraints, 105 inputs; anonymous_transfer.rs:57).  Same pipeline,
    different circuit + witness compiler."""

    CIRCUIT = AnonymousTransfer

    @staticmethod
    def _witness_fns():
        from . import witness_anon as wa

        return wa.witness_inputs_host, wa.anonymous_witness_jit


class MiniProver(ConfidentialProver):
    """Tiny fixture prover (models/mini.py) — lets the DEFAULT test suite
    drive the full witness->NTT->MSM->assembly pipeline end-to-end at a
    compile-friendly scale (the flagship circuits stay env-gated for
    compile cost, not correctness)."""

    from ..models.mini import MiniCommit as _MiniCommit

    CIRCUIT = _MiniCommit

    @staticmethod
    def _witness_fns():
        from . import witness_mini as wm

        return wm.witness_inputs_host, wm.mini_witness_jit
