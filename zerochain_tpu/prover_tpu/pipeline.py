"""End-to-end TPU Groth16 prover for ConfidentialTransfer.

prove = compiled witness synthesis -> constraint matvec -> NTT quotient ->
MSMs -> (host) final proof assembly.  Only the last step (6 single scalar
muls + 6 adds per proof) runs on host bigints; everything hot is JAX.
Mirrors bellman's create_random_proof pipeline (SURVEY.md §3.2).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..ec import g1 as jg1
from ..ec import g2 as jg2
from ..ec.fields import FqOps, Fq2Ops
from ..ff import limbs as L
from ..groth16 import domain as dom
from ..groth16.core import Parameters, Proof, _pad_input_constraints
from ..mirror import curves as cv
from ..mirror.field import R
from ..models.confidential import ConfidentialTransfer
from ..msm import pippenger as pip
from ..ntt import plan_for
from ..r1cs.system import ConstraintSystem
from .matvec import ConstraintMatrices
from . import witness as wit

FR = L.FR


class ConfidentialProver:
    """Holds device-resident CRS + compiled kernels for batched proving."""

    def __init__(self, params: Parameters):
        self.params = params
        cs = ConstraintSystem(track_names=False)
        ConfidentialTransfer().synthesize(cs)
        _pad_input_constraints(cs)
        self.matrices = ConstraintMatrices(cs, cs.num_inputs)
        self.num_inputs = cs.num_inputs
        self.num_aux = len(cs.aux)
        self.m = cs.num_constraints
        self.d = dom.domain_size(self.m)
        self.plan = plan_for(self.d)

        # device-resident CRS queries (None -> infinity, handled as Z=0)
        self.h_pts = jg1.from_affine_host(params.h)
        self.l_pts = jg1.from_affine_host(params.l)
        self.a_pts = jg1.from_affine_host(params.a)
        self.b1_pts = jg1.from_affine_host(params.b_g1)
        self.b2_pts = jg2.from_affine_host(params.b_g2)

        self.msm_g1 = pip.Msm(FqOps)
        self.msm_g2 = pip.Msm(Fq2Ops)

    # ------------------------------------------------------------------
    def _h_scalars(self, witness_mont):
        """witness (L, n_vars, B) -> quotient coeffs (L, d-1, B) mont."""
        a_v, b_v, c_v = self.matrices.eval(witness_mont)
        B = witness_mont.shape[-1]
        pad = self.d - self.m

        def pad_to_d(x):
            z = jnp.zeros((FR.n, pad, B), jnp.int32)
            return jnp.moveaxis(
                jnp.concatenate([x, z], axis=1), 1, -1
            )  # (L, B, d)

        a_c = self.plan.coset_ntt(self.plan.intt(pad_to_d(a_v)))
        b_c = self.plan.coset_ntt(self.plan.intt(pad_to_d(b_v)))
        c_c = self.plan.coset_ntt(self.plan.intt(pad_to_d(c_v)))
        q = L.sub(FR, L.mont_mul(FR, a_c, b_c), c_c)
        q = self.plan.divide_by_z_on_coset(q)
        h = self.plan.icoset_ntt(q)  # (L, B, d)
        h = jnp.moveaxis(h, -1, 1)[:, : self.d - 1]  # (L, d-1, B)
        return h

    # ------------------------------------------------------------------
    def prove(self, assignments: list[dict], rs=None) -> list[Proof]:
        """assignments: per-proof witness dicts (see witness_inputs_host).

        Returns bellman-equation-identical proofs (verified by the mirror
        verifier under the same CRS)."""
        B = len(assignments)
        inputs = wit.witness_inputs_host(assignments)
        aux, public = wit.confidential_witness_jit(**inputs)
        witness_mont = jnp.concatenate([public, aux], axis=1)

        h_scalars = self._h_scalars(witness_mont)

        # canonical bit arrays for the MSM scalars
        wit_canon = L.from_mont(FR, witness_mont)
        h_canon = L.from_mont(FR, h_scalars)
        wit_bits = pip.limbs_to_bits(wit_canon, 255)  # (255, n_vars, B)
        h_bits = pip.limbs_to_bits(h_canon, 255)

        proofs = []
        vk = self.params.vk
        for b in range(B):
            a_acc = self._affine(
                self.msm_g1(self.a_pts, wit_bits[:, :, b]), jg1
            )
            b1_acc = self._affine(
                self.msm_g1(self.b1_pts, wit_bits[:, :, b]), jg1
            )
            b2_acc = self._affine(
                self.msm_g2(self.b2_pts, wit_bits[:, :, b]), jg2
            )
            l_acc = self._affine(
                self.msm_g1(self.l_pts, wit_bits[:, self.num_inputs :, b]),
                jg1,
            )
            h_acc = self._affine(
                self.msm_g1(self.h_pts, h_bits[:, :, b]), jg1
            )

            r, s = (
                rs[b]
                if rs is not None
                else (
                    int.from_bytes(os.urandom(32), "little") % R,
                    int.from_bytes(os.urandom(32), "little") % R,
                )
            )
            g_a = cv.g1_add(
                cv.g1_add(vk.alpha_g1, a_acc), cv.g1_mul(vk.delta_g1, r)
            )
            g_b = cv.g2_add(
                cv.g2_add(vk.beta_g2, b2_acc), cv.g2_mul(vk.delta_g2, s)
            )
            b1_full = cv.g1_add(
                cv.g1_add(vk.beta_g1, b1_acc), cv.g1_mul(vk.delta_g1, s)
            )
            g_c = cv.g1_mul(g_a, s)
            g_c = cv.g1_add(g_c, cv.g1_mul(b1_full, r))
            g_c = cv.g1_add(
                g_c, cv.g1_neg(cv.g1_mul(vk.delta_g1, r * s % R))
            )
            g_c = cv.g1_add(g_c, l_acc)
            g_c = cv.g1_add(g_c, h_acc)
            proofs.append(Proof(a=g_a, b=g_b, c=g_c))
        return proofs

    def public_inputs(self, assignments: list[dict]) -> list[list[int]]:
        """The 22 runtime public inputs per proof (without ONE)."""
        inputs = wit.witness_inputs_host(assignments)
        _, public = wit.confidential_witness_jit(**inputs)
        pub = np.asarray(public)
        out = []
        for b in range(len(assignments)):
            vals = L.from_limbs(FR, pub[:, :, b], mont=True)
            out.append(vals[1:])
        return out

    @staticmethod
    def _affine(jac, grp):
        return grp.to_affine_host(
            pip.tmap(lambda a: a[..., None], jac)
        )[0]
