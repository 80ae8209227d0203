"""sumcheck_tpu — a TPU-native linear-time sumcheck framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
arkworks-rs/sumcheck (see SURVEY.md): `MLSumcheck` (sums of products of
multilinear polynomials over the boolean hypercube, Libra linear-time prover)
and `GKRRoundSumcheck` (two-phase Libra GKR round sumcheck), over the
BLS12-381 scalar field with a bit-exact arkworks-compatible Blake2b-512
Fiat-Shamir transcript.
"""

import os as _os

import jax as _jax

# Persistent XLA/Mosaic compilation cache: per-round-shape kernels compile
# once per machine, not once per process. (The JAX_COMPILATION_CACHE_DIR env
# var is not honored in this environment; the config knob is.)
if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"),
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .data_structures import ListOfProductsOfPolynomials, PolynomialInfo
from .fields.fr import Fr
from .fields.generic import Field, FieldEl, default_field, get_field
from .gkr_round_sumcheck import GKRProof, GKRRoundSumcheck, GKRRoundSumcheckSubClaim
from .ml_sumcheck import MLSumcheck
from .mle import DenseMLE, SparseMLE
from .portable import PortableDenseMLE, PortableSparseMLE
from .protocol import IPForMLSumcheck
from .transcript.blake2b_rng import Blake2b512Rng
from .utils.errors import (
    IOError_,
    OtherError,
    Reject,
    RNGError,
    SerializationError,
    SumcheckError,
)

__version__ = "0.1.0"

__all__ = [
    "Blake2b512Rng",
    "DenseMLE",
    "Field",
    "FieldEl",
    "Fr",
    "PortableDenseMLE",
    "PortableSparseMLE",
    "default_field",
    "get_field",
    "GKRProof",
    "GKRRoundSumcheck",
    "GKRRoundSumcheckSubClaim",
    "IPForMLSumcheck",
    "IOError_",
    "ListOfProductsOfPolynomials",
    "MLSumcheck",
    "OtherError",
    "PolynomialInfo",
    "Reject",
    "RNGError",
    "SerializationError",
    "SparseMLE",
    "SumcheckError",
    "__version__",
]
