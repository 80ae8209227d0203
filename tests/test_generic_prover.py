"""Shape-generic chained prover: bit-identity vs the host round engine.

One compiled program serves every round (dynamic active extent + dynamic
transcript byte offset) — these tests pin that its proofs, challenges, and
restored transcript state are byte-identical to the pure host path
(`protocol/prover.py` + host Blake2b), across block/tail path boundaries.
"""

from __future__ import annotations

import pytest

from sumcheck_tpu import Blake2b512Rng, Fr, MLSumcheck
from sumcheck_tpu.ml_sumcheck import serialize_proof
from sumcheck_tpu.protocol.generic_prover import prove_generic
from sumcheck_tpu.utils.config import get_config

from conftest import random_list_of_products


def _host_proof(poly):
    cfg = get_config()
    saved = cfg.engine
    cfg.engine = "host"
    try:
        rng = Blake2b512Rng.setup()
        proof, state = MLSumcheck.prove_as_subprotocol(rng, poly)
    finally:
        cfg.engine = saved
    return proof, state, rng


@pytest.mark.parametrize("block", [4, 256])
def test_generic_matches_host(rnd, block):
    """nv=7 crosses the block->tail boundary for every block size here."""
    poly, _ = random_list_of_products(7, (2, 4), 3, rnd)
    href, hstate, hrng = _host_proof(poly)

    rng = Blake2b512Rng.setup()
    rng.feed(poly.info())
    proof, state = prove_generic(rng, poly, block=block)

    assert serialize_proof(proof) == serialize_proof(href)
    assert [r.v for r in state.randomness] == [r.v for r in hstate.randomness]
    # restored transcript must continue identically to the host transcript
    assert rng.fill_bytes(40) == hrng.fill_bytes(40)


def test_generic_tiny_instance(rnd):
    """H < block: every round takes the masked-slab tail path."""
    poly, _ = random_list_of_products(3, (1, 3), 2, rnd)
    href, _, _ = _host_proof(poly)
    rng = Blake2b512Rng.setup()
    rng.feed(poly.info())
    proof, _ = prove_generic(rng, poly, block=256)
    assert serialize_proof(proof) == serialize_proof(href)


def test_generic_verifies(rnd):
    poly, s = random_list_of_products(6, (2, 3), 2, rnd)
    rng = Blake2b512Rng.setup()
    rng.feed(poly.info())
    proof, _ = prove_generic(rng, poly, block=8)
    sub = MLSumcheck.verify(poly.info(), s, proof)
    assert poly.evaluate(sub.point) == sub.expected_evaluation


def test_dyn_transcript_matches_static():
    """absorb/sample with dynamic blen == the static-offset device path ==
    the host transcript, across several feed sizes and offsets."""
    import jax.numpy as jnp

    from sumcheck_tpu.fields.fr import NUM_DIGITS
    from sumcheck_tpu.transcript.device import (
        DevTranscript,
        absorb_dyn,
        fr_rand_dyn,
    )

    host = Blake2b512Rng.setup()
    ts = DevTranscript.lift(host.state_tuple())
    state = (ts.h, ts.t, ts.buf, jnp.uint32(ts.blen))

    import numpy as np

    for size_words in [2, 1, 17, 16, 5]:
        data = bytes(range(size_words * 8))
        host.feed_bytes(data)
        words = np.frombuffer(data, np.uint32).reshape(size_words, 2)
        state = absorb_dyn(state, jnp.asarray(words), size_words * 8)
        d, state = fr_rand_dyn(state)
        want = Fr.rand(host)
        got = 0
        for k in range(NUM_DIGITS):
            got |= int(d[k]) << (16 * k)
        from sumcheck_tpu.fields.fr import P, R_INV

        assert got * R_INV % P == want.v


@pytest.mark.slow
def test_pallas_chain_matches_jnp(rnd):
    """The fused Pallas block body (interpret mode off-TPU) produces proofs
    byte-identical to the jnp body across multi-block, sub-block, and
    first-round paths (ops/round_pallas.py chain kernels)."""
    import sumcheck_tpu.protocol.generic_prover as GP

    poly, _ = random_list_of_products(6, (2, 3), 2, rnd)
    href, _, _ = _host_proof(poly)

    cfg = get_config()
    saved = cfg.pallas
    cfg.pallas = "on"
    GP._generic_step_impl.cache_clear()
    GP._chain_step_impl.cache_clear()
    try:
        rng = Blake2b512Rng.setup()
        rng.feed(poly.info())
        proof, _ = prove_generic(rng, poly, block=8)
    finally:
        cfg.pallas = saved
        GP._generic_step_impl.cache_clear()
        GP._chain_step_impl.cache_clear()
    assert serialize_proof(proof) == serialize_proof(href)
