"""Distributed kernels on the virtual 8-device CPU mesh (default suite).

Design is greenfield per SURVEY.md §2.4: the reference has no multi-device
compute at all (bellman's multicore fans across CPU threads); here MSM
shards points over the mesh with an all-gather reduction and the NTT is the
four-step algorithm with one all-to-all transpose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from zerochain_tpu.dist.msm import sharded_msm, sharded_msm_g1
from zerochain_tpu.dist.ntt import distributed_ntt
from zerochain_tpu.ec import g1 as jg1
from zerochain_tpu.ec import g2 as jg2
from zerochain_tpu.ec.fields import Fq2Ops
from zerochain_tpu.ff import limbs as L
from zerochain_tpu.groth16 import domain as dom
from zerochain_tpu.mirror import curves as cv
from zerochain_tpu.mirror.field import R
from zerochain_tpu.msm import pippenger as pip


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 virtual CPU devices"
    return Mesh(np.asarray(devs), ("pt",))


def test_sharded_msm_g1(mesh):
    n_pts = 32  # 4 per device
    pts_host, cur = [], cv.G1_GEN
    for _ in range(n_pts):
        pts_host.append(cur)
        cur = cv.g1_double(cur)
    scalars = [(3 + 7 * i) % R for i in range(n_pts)]
    pts = jg1.from_affine_host(pts_host)
    bits = pip.scalars_to_bits(scalars, 32)

    res = sharded_msm_g1(pts, bits, mesh, "pt", use_pippenger=False)
    out = jg1.to_affine_host(pip.tmap(lambda a: a[..., None], res))[0]
    assert out == cv.g1_msm(pts_host, scalars)


def test_sharded_msm_g2_batched(mesh):
    """G2 + a proof-batch axis through the sharded MSM (prover shape)."""
    n_pts, B = 16, 2
    pts_host, cur = [], cv.G2_GEN
    for _ in range(n_pts):
        pts_host.append(cur)
        cur = cv.g2_double(cur)
    scalars = [[(5 + 3 * i + b) % (1 << 16) for i in range(n_pts)]
               for b in range(B)]
    pts = jg2.from_affine_host(pts_host)
    bits = jnp.stack(
        [pip.scalars_to_bits(s, 16) for s in scalars], axis=-1
    )  # (16, N, B)

    res = sharded_msm(Fq2Ops, pts, bits, mesh, "pt", use_pippenger=True)
    out = jg2.to_affine_host(res)
    for b in range(B):
        acc = None
        for p, s in zip(pts_host, scalars[b]):
            acc = cv.g2_add(acc, cv.g2_mul(p, s))
        assert out[b] == acc


def test_distributed_ntt(mesh):
    d1 = d2 = 16
    d = d1 * d2
    vals = [(11 * i + 5) % R for i in range(d)]
    x = L.to_limbs(L.FR, vals, mont=True)
    y = distributed_ntt(x, mesh, "pt", d1, d2)
    got = L.from_limbs(L.FR, y, mont=True)
    assert got == dom.ntt(vals, dom.omega_for(d))


def test_sharded_suffix_msm(mesh):
    """The PRODUCTION suffix-MSM path sharded over the point axis: each
    chip sorts/scans its local slice, per-window partial points are
    all-gathered + tree-reduced (this is what ZEROCHAIN_DIST=1 runs)."""
    from zerochain_tpu.ec import weierstrass as W
    from zerochain_tpu.ec.fields import FqOps
    from zerochain_tpu.dist.msm import sharded_suffix
    from zerochain_tpu.msm.suffix import SuffixMsm

    rng = np.random.RandomState(3)
    N, B = 16, 2
    pts_host = [cv.g1_mul(cv.G1_GEN, 3 + 5 * i) for i in range(N)]
    pts_host[4] = None
    scal = [[int(rng.randint(0, 1 << 30)) for _ in range(N)]
            for _ in range(B)]
    pts = jg1.from_affine_host(pts_host)

    m = SuffixMsm(FqOps, c=4, n_bits=31, window_group=4, signed=True)
    limbs = jnp.asarray(
        np.stack(
            [np.stack([L._int_to_limbs(v, L.FR.n) for v in s], 1)
             for s in scal], -1,
        )
    )
    digits = m.digits(limbs)
    part = sharded_suffix(m, pts, digits, mesh, "pt")
    got = jg1.to_affine_host(m.combine(part))
    assert got == [cv.g1_msm(pts_host, s) for s in scal]
    # bit-exact vs the single-device path
    single = jg1.to_affine_host(m.combine(m.window_partials(pts, digits)))
    assert got == single


def test_dist_ntt_family(mesh):
    """intt/coset_ntt/icoset_ntt vs the single-device NttPlan."""
    from zerochain_tpu.dist.ntt import DistNtt
    from zerochain_tpu.ntt.ntt import plan_for

    d1 = d2 = 16
    d = d1 * d2
    rng = np.random.RandomState(5)
    vals = [int.from_bytes(rng.bytes(31), "little") % R for i in range(d)]
    x = L.to_limbs(L.FR, vals, mont=True)
    dn = DistNtt(d1, d2, mesh, "pt")
    plan = plan_for(d)
    for name in ("ntt", "intt", "coset_ntt", "icoset_ntt"):
        got = np.asarray(getattr(dn, name)(x))
        want = np.asarray(getattr(plan, name)(x))
        assert np.array_equal(got, want), name


def test_dist_quotient(mesh):
    """The full distributed quotient chain (what _h_scalars needs) vs
    the NttPlan chain, with a proof-batch axis."""
    from zerochain_tpu.dist.ntt import DistNtt
    from zerochain_tpu.ntt.ntt import plan_for

    d1 = d2 = 16
    d = d1 * d2
    B = 2
    rng = np.random.RandomState(6)

    def arr():
        vals = [int.from_bytes(rng.bytes(31), "little") % R
                for _ in range(d * B)]
        return L.to_limbs(L.FR, vals, mont=True).reshape(L.FR.n, B, d)

    a_ev, b_ev, c_ev = arr(), arr(), arr()
    dn = DistNtt(d1, d2, mesh, "pt")
    got = np.asarray(dn.quotient(a_ev, b_ev, c_ev))

    plan = plan_for(d)
    a_c = plan.coset_ntt(plan.intt(a_ev))
    b_c = plan.coset_ntt(plan.intt(b_ev))
    c_c = plan.coset_ntt(plan.intt(c_ev))
    q = L.sub(L.FR, L.mont_mul(L.FR, a_c, b_c), c_c)
    q = plan.divide_by_z_on_coset(q)
    want = np.asarray(plan.icoset_ntt(q))
    assert np.array_equal(got, want)


def test_dist_prover_end_to_end(mesh, monkeypatch):
    """ZEROCHAIN_DIST=1 through the REAL prover pipeline (MiniProver):
    witness -> DISTRIBUTED quotient (four-step all_to_all NTTs) ->
    SHARDED suffix MSMs (per-chip local sort/scan + all-gathered window
    partials) -> assembly, verified against the mirror Groth16 verifier.
    This is exactly what the flagship prover runs multi-chip."""
    monkeypatch.setenv("ZEROCHAIN_DIST", "1")
    monkeypatch.setenv("ZEROCHAIN_MSM_CHUNK", "256")
    from zerochain_tpu.groth16.core import (
        prepare_verifying_key, verify_proof,
    )
    from zerochain_tpu.prover_tpu.pipeline import MiniProver

    prover = MiniProver.from_toxic_waste(
        tau=515151, alpha=117, beta=223, gamma=331, delta=447,
        chunk=256, chunk_g2=256,
    )
    assert prover.mesh is not None, "dist mode must engage on the mesh"
    assignments = [dict(amount=77), dict(amount=3)]
    proofs = prover.prove(assignments, rs=[(21, 23), (25, 27)])

    pvk = prepare_verifying_key(prover.vk)
    pubs = prover.public_inputs(assignments)
    for proof, pub in zip(proofs, pubs):
        assert verify_proof(pvk, proof, pub)
    assert not verify_proof(pvk, proofs[0], pubs[1])
