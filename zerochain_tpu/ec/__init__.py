"""Batched elliptic-curve kernels over limb arrays (JAX/TPU).

Structure-of-arrays layout: a batch of points is a tuple of coordinate limb
arrays, each ``(n_limbs, *batch)``.  All group laws are branch-free
(complete/unified formulas or masked arithmetic) so they trace into static
XLA graphs — no data-dependent control flow (SURVEY.md §7 hard parts).
"""

from . import jubjub
from . import g1
from . import g2
