"""MXU banded-matmul Montgomery multiply: bit-identity vs the CIOS path.

`ops/mxu_mul.mont_mul_scalar_mxu` moves multiply-by-shared-scalar onto the
systolic array (bf16 8-bit-digit convolutions, f32-exact accumulation); these
tests pin (a) the kernel against the uint64 NumPy reference model across
random and edge operands, and (b) a full chained prove with the MXU fold
forced on against the host-path proof bytes.
"""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sumcheck_tpu import Blake2b512Rng, MLSumcheck
from sumcheck_tpu.fields.fr import NUM_DIGITS, P, R_INV
from sumcheck_tpu.ml_sumcheck import serialize_proof
from sumcheck_tpu.ops.mxu_mul import mont_mul_scalar_mxu
from sumcheck_tpu.protocol.generic_prover import prove_generic
from sumcheck_tpu.utils.config import get_config

from conftest import random_list_of_products


def _digits(v: int) -> list[int]:
    return [(v >> (16 * j)) & 0xFFFF for j in range(NUM_DIGITS)]


def _col(vals) -> np.ndarray:
    return np.array([_digits(v) for v in vals], np.uint32).T.copy()


def _ints(arr: np.ndarray) -> list[int]:
    return [
        sum(int(arr[j, i]) << (16 * j) for j in range(NUM_DIGITS))
        for i in range(arr.shape[1])
    ]


def test_kernel_matches_reference():
    prnd = random.Random(7)
    vals = [prnd.randrange(P) for _ in range(300)]
    vals += [0, 1, 2, P - 1, P - 2, (1 << 255) % P, (1 << 128) % P]
    a = jnp.asarray(_col(vals))
    fn = jax.jit(mont_mul_scalar_mxu)
    for cv in [prnd.randrange(P), 0, 1, P - 1, (1 << 240) % P]:
        c = jnp.asarray(np.array(_digits(cv), np.uint32))
        got = _ints(np.asarray(fn(a, c)))
        want = [(v * cv * R_INV) % P for v in vals]
        assert got == want, f"mismatch for c={cv:#x}"


def test_kernel_multidim_shape():
    """(16, U, B) tables — the fold path's actual operand shape."""
    prnd = random.Random(9)
    vals = [prnd.randrange(P) for _ in range(3 * 8)]
    a = jnp.asarray(_col(vals).reshape(NUM_DIGITS, 3, 8))
    cv = prnd.randrange(P)
    c = jnp.asarray(np.array(_digits(cv), np.uint32))
    out = np.asarray(jax.jit(mont_mul_scalar_mxu)(a, c)).reshape(NUM_DIGITS, 24)
    assert _ints(out) == [(v * cv * R_INV) % P for v in vals]


@pytest.fixture
def _mxu_fold_on():
    cfg = get_config()
    saved = (cfg.mxu_fold, cfg.ab)
    cfg.mxu_fold, cfg.ab = "on", True  # quarantined A/B body: unlock
    yield
    cfg.mxu_fold, cfg.ab = saved


def test_chained_prove_with_mxu_fold_matches_host(rnd, _mxu_fold_on):
    """Full generic-chain prove with the MXU fold: proof bytes must equal the
    host-path proof (same instance, same transcript)."""
    poly, _ = random_list_of_products(6, (2, 4), 2, rnd)
    cfg = get_config()
    saved = cfg.engine
    cfg.engine = "host"
    try:
        href, _hstate = MLSumcheck.prove_as_subprotocol(Blake2b512Rng.setup(), poly)
    finally:
        cfg.engine = saved

    rng = Blake2b512Rng.setup()
    rng.feed(poly.info())
    proof, _state = prove_generic(rng, poly, block=16)
    assert serialize_proof(proof) == serialize_proof(href)


def test_chained_prove_with_mxu_kernel_matches_host(rnd):
    """In-Pallas MXU fold (interpret mode off-TPU): proof bytes must equal
    the host path."""
    poly, _ = random_list_of_products(6, (2, 3), 2, rnd)
    cfg = get_config()
    saved = (cfg.engine, cfg.mxu_fold, cfg.pallas, cfg.ab)
    cfg.engine = "host"
    try:
        href, _ = MLSumcheck.prove_as_subprotocol(Blake2b512Rng.setup(), poly)
        cfg.engine, cfg.mxu_fold, cfg.pallas, cfg.ab = (
            "device", "kernel", "on", True)
        rng = Blake2b512Rng.setup()
        rng.feed(poly.info())
        proof, _state = prove_generic(rng, poly, block=16)
    finally:
        cfg.engine, cfg.mxu_fold, cfg.pallas, cfg.ab = saved
    assert serialize_proof(proof) == serialize_proof(href)


def test_gkr_eq_table_mxu_matches_cios(rnd, _mxu_fold_on, monkeypatch):
    """The eq-table doublings and f2(u)-scaling must be bit-identical on the
    MXU path (threshold lowered so tiny test tables exercise it)."""
    from sumcheck_tpu.fields.fr import Fr
    from sumcheck_tpu.ops import gkr_init as GI

    monkeypatch.setattr(GI, "MXU_MIN_LANES", 1)
    pts = [Fr(rnd.randrange(P)) for _ in range(5)]
    r_pts, omr_pts = GI._points_arrays(pts)
    got = np.asarray(GI._eq_table(jnp.asarray(r_pts), jnp.asarray(omr_pts), 5))

    cfg = get_config()
    cfg.mxu_fold = "off"
    want = np.asarray(GI._eq_table(jnp.asarray(r_pts), jnp.asarray(omr_pts), 5))
    cfg.mxu_fold = "on"
    assert (got == want).all()


def test_mxu_fold_quarantined_without_ab_flag():
    """The losing A/B bodies (MXU_AB.json) must refuse to engage without
    SUMCHECK_TPU_AB=1 (VERDICT round-4 ask #8)."""
    cfg = get_config()
    saved = (cfg.mxu_fold, cfg.ab)
    try:
        cfg.mxu_fold, cfg.ab = "xla", False
        with pytest.raises(ValueError, match="SUMCHECK_TPU_AB"):
            cfg.mxu_mode()
        cfg.mxu_fold = "kernel"
        with pytest.raises(ValueError, match="SUMCHECK_TPU_AB"):
            cfg.mxu_mode()
        cfg.ab = True
        assert cfg.mxu_mode() == "kernel"  # unlocked
    finally:
        cfg.mxu_fold, cfg.ab = saved
