"""Randomized cross-engine fuzz over product STRUCTURES (ragged
multiplicand counts, shared tables, repeated slots, unit and non-unit
coefficients): host-engine and chained-generic proofs must agree byte for
byte for every structure. Complements the fixed-shape equality tests —
the coefficient fold plan (`device_prover._fold_plan`), ones-slot padding,
and slot dedup are structure-dependent."""

import pytest

from sumcheck_tpu import Blake2b512Rng, DenseMLE, Fr, ListOfProductsOfPolynomials, MLSumcheck
from sumcheck_tpu.fields.fr import P
from sumcheck_tpu.ml_sumcheck import serialize_proof
from sumcheck_tpu.utils.config import get_config


def _random_structure(rnd, nv):
    """1-3 products over a small shared MLE pool, 1-4 multiplicands each,
    mixing unit and random coefficients."""
    pool = [DenseMLE.rand(nv, rnd) for _ in range(rnd.randrange(2, 5))]
    poly = ListOfProductsOfPolynomials(nv)
    for _ in range(rnd.randrange(1, 4)):
        mults = [rnd.choice(pool) for _ in range(rnd.randrange(1, 5))]
        coeff = Fr.one() if rnd.random() < 0.3 else Fr(rnd.randrange(1, P))
        poly.add_product(mults, coeff)
    return poly


@pytest.mark.slow
def test_fuzz_structures_cross_engine(rnd):
    nv = 6
    cfg = get_config()
    saved = (cfg.engine, cfg.chained, cfg.chain_impl)
    try:
        for case in range(4):
            poly = _random_structure(rnd, nv)
            cfg.engine, cfg.chained = "host", "off"
            href, _ = MLSumcheck.prove_as_subprotocol(
                Blake2b512Rng.setup(), poly
            )
            s = MLSumcheck.extract_sum(href)
            cfg.engine, cfg.chained, cfg.chain_impl = "device", "on", "generic"
            dref, _ = MLSumcheck.prove_as_subprotocol(
                Blake2b512Rng.setup(), poly
            )
            assert serialize_proof(dref) == serialize_proof(href), (
                f"case {case}: structure {[ix for _, ix in poly.products]}"
            )
            sub = MLSumcheck.verify(poly.info(), s, href)
            assert poly.evaluate(sub.point) == sub.expected_evaluation
    finally:
        cfg.engine, cfg.chained, cfg.chain_impl = saved
