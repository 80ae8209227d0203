"""sumcheck_tpu — a TPU-native linear-time sumcheck framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
arkworks-rs/sumcheck (see SURVEY.md): `MLSumcheck` (sums of products of
multilinear polynomials over the boolean hypercube, Libra linear-time prover)
and `GKRRoundSumcheck` (two-phase Libra GKR round sumcheck), over the
BLS12-381 scalar field with a bit-exact arkworks-compatible Blake2b-512
Fiat-Shamir transcript.
"""

from .data_structures import ListOfProductsOfPolynomials, PolynomialInfo
from .fields.fr import Fr
from .gkr_round_sumcheck import GKRProof, GKRRoundSumcheck, GKRRoundSumcheckSubClaim
from .ml_sumcheck import MLSumcheck
from .mle import DenseMLE, SparseMLE
from .protocol import IPForMLSumcheck
from .transcript.blake2b_rng import Blake2b512Rng
from .utils.errors import Reject, SumcheckError

__version__ = "0.1.0"

__all__ = [
    "Blake2b512Rng",
    "DenseMLE",
    "Fr",
    "GKRProof",
    "GKRRoundSumcheck",
    "GKRRoundSumcheckSubClaim",
    "IPForMLSumcheck",
    "ListOfProductsOfPolynomials",
    "MLSumcheck",
    "PolynomialInfo",
    "Reject",
    "SparseMLE",
    "SumcheckError",
    "__version__",
]
