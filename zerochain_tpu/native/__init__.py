"""Native (C) host-runtime components.

The TPU compute path is JAX/XLA; the host runtime around it (data
marshaling between bigints and tensor layouts) is C, compiled on first use
and loaded through ctypes.  Falls back to NumPy if no compiler is available.
"""

from .codec import (
    native_available,
    scalars_to_bits_np,
    scalars_to_limbs_np,
    limbs_to_scalars,
)
