"""Radix-2 NTT over Fr for the Groth16 quotient polynomial (JAX/TPU)."""

from .ntt import NttPlan, plan_for
