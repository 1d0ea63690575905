"""Multi-scalar multiplication kernels (JAX/TPU)."""

from .pippenger import msm_g1, msm_g2, Msm, FixedBaseMsm
