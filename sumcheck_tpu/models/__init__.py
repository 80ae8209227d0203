"""The "model zoo" of this framework is its two protocol families — the
reference library is a protocol library, not an ML framework (SURVEY.md §1:
"the 'models' of this library are the two protocols"). Re-exported here so
`sumcheck_tpu.models` mirrors that inventory explicitly:

- `MLSumcheck` — multilinear sumcheck over products of dense MLEs
  (reference `src/ml_sumcheck/`).
- `GKRRoundSumcheck` — two-phase Libra sumcheck for GKR round functions
  (reference `src/gkr_round_sumcheck/`).
- `BatchedMLSumcheck` — throughput-mode batched prover (new; no reference
  analog).
- `ShardedProver` — multi-chip mesh prover (new; no reference analog).
"""

from ..batch import BatchedMLSumcheck
from ..gkr_round_sumcheck import GKRRoundSumcheck
from ..ml_sumcheck import MLSumcheck
from ..parallel.prover import ShardedProver

__all__ = ["BatchedMLSumcheck", "GKRRoundSumcheck", "MLSumcheck", "ShardedProver"]
