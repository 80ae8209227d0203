"""Fused Pallas round kernel vs the portable engines (interpret mode on CPU;
the same kernel compiles natively on TPU). Bit-identical sums and folded
tables are required."""

import numpy as np
import pytest

from sumcheck_tpu.fields import limbs_np as L
from sumcheck_tpu.fields.fr import NUM_DIGITS, P
from sumcheck_tpu.ops.round_pallas import round_pallas
from sumcheck_tpu.protocol import engine


def _mk(rnd, u1, n):
    vals = [rnd.randrange(P) for _ in range(u1 * n)]
    return L.from_ints(vals).reshape(NUM_DIGITS, u1, n)


@pytest.mark.slow
@pytest.mark.parametrize("do_fold", [False, True])
def test_pallas_round_matches_engine(rnd, do_fold):
    import jax.numpy as jnp

    u1 = 3  # 2 tables + ones slot
    n = 256  # table length (small: interpret-mode compiles are CPU-costly)
    products = ((0, 1), (1, 0))
    degree = 2
    stacked = _mk(rnd, u1, n)
    stacked[:, u1 - 1, :] = L.mont_scalar(1)  # ones slot
    r = L.mont_scalar(rnd.randrange(P))
    coeffs = np.stack([L.mont_scalar(5), L.mont_scalar(9)])  # (P, 16, 1)

    # reference: portable host engine on the same bitrev layout
    ref_tables = stacked
    if do_fold:
        ref_tables = engine.fold_tables(engine.HOST, ref_tables, r[:, None, :])
    ref_sums = engine.round_sums(
        engine.HOST,
        ref_tables,
        coeffs[:, :, :, None].transpose(1, 0, 2, 3),
        np.array([list(p) for p in products], dtype=np.int32),
        degree,
    )

    # kernel layout: slot axis leading (U, 16, half)
    slotled = stacked.transpose(1, 0, 2)
    lo = jnp.asarray(slotled[:, :, : n // 2])
    hi = jnp.asarray(slotled[:, :, n // 2 :])
    r_digits = jnp.asarray(r[:, 0])
    coeffs_pd = jnp.asarray(coeffs[:, :, 0])
    new_pair, sums = round_pallas(
        lo, hi, r_digits, coeffs_pd, products, degree, do_fold, block=64, interpret=True
    )
    assert (np.asarray(sums) == ref_sums).all(), "sums differ"
    if do_fold:
        got = np.concatenate([np.asarray(new_pair[0]), np.asarray(new_pair[1])], axis=2)
        assert (got == ref_tables.transpose(1, 0, 2)).all(), "folded tables differ"


@pytest.mark.slow
def test_pallas_full_prove_matches_host(rnd):
    """Force the Pallas engine (interpret mode) through a full prove."""
    from sumcheck_tpu import DenseMLE, Fr, ListOfProductsOfPolynomials, MLSumcheck
    from sumcheck_tpu.utils.config import get_config

    nv = 10  # big enough that use_pallas() accepts and two rounds run fused
    tabs = [[rnd.randrange(P) for _ in range(1 << nv)] for _ in range(2)]

    def build():
        mles = [DenseMLE.from_evaluations(nv, t) for t in tabs]
        poly = ListOfProductsOfPolynomials(nv)
        poly.add_product([mles[0], mles[1]], Fr(7))
        return poly

    cfg = get_config()
    old = (cfg.engine, cfg.pallas, cfg.device_threshold)
    try:
        cfg.engine, cfg.pallas = "host", "off"
        expect = MLSumcheck.prove(build())
        cfg.engine, cfg.pallas, cfg.device_threshold = "auto", "on", 1 << 8
        got = MLSumcheck.prove(build())
    finally:
        cfg.engine, cfg.pallas, cfg.device_threshold = old
    assert all(a == b for a, b in zip(expect, got)), "pallas prove differs"
