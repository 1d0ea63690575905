"""TPU proving pipeline: compiled witness synthesis + NTT quotient + MSMs.

The reference interprets circuits imperatively per proof (external bellman
ConstraintSystem); here the circuit is a fixed static graph, so witness
generation compiles once and runs batched (SURVEY.md §7 step 6).
"""

from .matvec import ConstraintMatrices
from .backend import TpuBackend
