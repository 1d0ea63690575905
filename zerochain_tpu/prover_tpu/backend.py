"""Groth16 compute backend backed by the TPU kernels (host-level API)."""

from __future__ import annotations

from ..ec.fields import FqOps, Fq2Ops
from ..mirror import curves as cv
from ..msm import pippenger as pip


class TpuBackend:
    """Drop-in for groth16.core.MirrorBackend: JAX MSM kernels."""

    def __init__(self):
        self._fb_g1 = None
        self._fb_g2 = None

    @staticmethod
    def msm_g1(points, scalars):
        return pip.msm_g1(points, scalars)

    @staticmethod
    def msm_g2(points, scalars):
        return pip.msm_g2(points, scalars)

    def fixed_base_g1(self, exponents, chunk: int = 16384):
        from ..ec import g1 as grp

        if self._fb_g1 is None:
            self._fb_g1 = pip.FixedBaseMsm(FqOps, cv.G1_GEN)
        return self._fixed_base(self._fb_g1, grp, exponents, chunk)

    def fixed_base_g2(self, exponents, chunk: int = 8192):
        from ..ec import g2 as grp

        if self._fb_g2 is None:
            self._fb_g2 = pip.FixedBaseMsm(Fq2Ops, cv.G2_GEN)
        return self._fixed_base(self._fb_g2, grp, exponents, chunk)

    @staticmethod
    def _fixed_base(fb, grp, exponents, chunk):
        out = []
        for off in range(0, len(exponents), chunk):
            part = exponents[off : off + chunk]
            pad = chunk - len(part)  # fixed shapes -> one compilation
            bits = pip.scalars_to_bits(part + [0] * pad, 255)
            res = fb(bits)
            out.extend(grp.to_affine_host(res)[: len(part)])
        return out

    @staticmethod
    def compute_h(cs):
        """Quotient polynomial via the device NTT plan (generic circuits)."""
        import jax.numpy as jnp

        from ..ff import limbs as L
        from ..groth16 import domain as dom
        from ..ntt import plan_for

        FR = L.FR
        m = cs.num_constraints
        d = dom.domain_size(m)
        plan = plan_for(d)

        def vals(which):
            evals = [cs.eval_lc(c[which]) for c in cs.constraints]
            return L.to_limbs(FR, evals + [0] * (d - m), mont=True)

        a_c = plan.coset_ntt(plan.intt(vals(0)))
        b_c = plan.coset_ntt(plan.intt(vals(1)))
        c_c = plan.coset_ntt(plan.intt(vals(2)))
        q = L.sub(FR, L.mont_mul(FR, a_c, b_c), c_c)
        q = plan.divide_by_z_on_coset(q)
        h = plan.icoset_ntt(q)
        return L.from_limbs(FR, h[:, : d - 1], mont=True)
