"""Multi-chip scaling: sharded NTT and MSM over a jax.sharding.Mesh.

The reference has no distributed compute (SURVEY.md §2.4) — its prover is
single-host multicore.  Here scaling is first-class: MSM shards points
across chips with an all-gather + local reduction of partial sums; the NTT
uses the four-step decomposition with one all-to-all transpose over ICI
between the two local NTT phases (the 2^22 design of BASELINE.json
configs[4]).
"""

from .ntt import distributed_ntt
from .msm import sharded_msm_g1
