"""Chained on-device prover + device transcript: bit-exactness vs the host
path (SURVEY.md §4 "bit-exactness fixtures" adaptation — the two engines must
produce byte-identical proofs for the same instance)."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sumcheck_tpu import Fr, MLSumcheck
from sumcheck_tpu.fields.fr import NUM_DIGITS, P, R_INV
from sumcheck_tpu.ml_sumcheck import serialize_proof
from sumcheck_tpu.transcript import device as D
from sumcheck_tpu.transcript.blake2b_rng import Blake2b512Rng, fr_rand as host_fr_rand
from sumcheck_tpu.transcript.serialize import serialize_fr_vec
from sumcheck_tpu.utils.config import get_config

from conftest import random_list_of_products


@pytest.fixture
def chained_cfg():
    cfg = get_config()
    old = (cfg.chained, cfg.device_threshold)
    cfg.chained, cfg.device_threshold = "on", 1
    yield cfg
    cfg.chained, cfg.device_threshold = old


def _digits(v: int) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(NUM_DIGITS)], np.uint32)


def test_device_transcript_matches_host():
    """Interleaved feed(Vec<Fr>)/fr_rand on device == host, including the
    final hasher state (lift → advance on device → lower round-trip)."""
    rnd = random.Random(0xD1CE)
    host = Blake2b512Rng.setup()
    host.feed_bytes(b"\x07" * 16)
    ts = D.DevTranscript.lift(host.state_tuple())

    blen = ts.blen
    k = 4
    vals = [[rnd.randrange(P) for _ in range(k)] for _ in range(3)]

    @jax.jit
    def run(carry, mats):
        t = D.DevTranscript.from_carry(carry, blen)
        outs = []
        for m in mats:
            t = D.feed_fr_vec(t, m)
            dig, t = D.fr_rand(t)
            outs.append(dig)
        return t.carry(), jnp.stack(outs)

    mats = [jnp.asarray(np.stack([_digits(v) for v in vs], axis=1)) for vs in vals]
    carry, digs = run(ts.carry(), mats)

    expected = []
    for vs in vals:
        host.feed_bytes(serialize_fr_vec([Fr(v) for v in vs]))
        expected.append(host_fr_rand(host))

    digs = np.asarray(digs)
    for step, exp in enumerate(expected):
        mont = sum(int(digs[step][i]) << (16 * i) for i in range(NUM_DIGITS))
        assert mont * R_INV % P == exp

    final_blen = len(host.state_tuple()[2])
    lowered = D.DevTranscript.from_carry(jax.device_get(carry), final_blen).lower()
    assert lowered == host.state_tuple()


@pytest.mark.slow
def test_chained_proof_bit_exact(rnd):
    """Chained device prove == host-loop prove, byte for byte, and the
    caller's transcript ends in the identical state (composition safety)."""
    poly, asserted = random_list_of_products(6, (3, 4), 2, rnd)
    cfg = get_config()
    old = (cfg.chained, cfg.device_threshold)
    try:
        cfg.chained, cfg.device_threshold = "off", 1 << 40
        fs_host = Blake2b512Rng.setup()
        ref, _ = MLSumcheck.prove_as_subprotocol(fs_host, poly)

        cfg.chained, cfg.device_threshold = "on", 1
        fs_dev = Blake2b512Rng.setup()
        got, state = MLSumcheck.prove_as_subprotocol(fs_dev, poly)
    finally:
        cfg.chained, cfg.device_threshold = old

    assert serialize_proof(got) == serialize_proof(ref)
    assert fs_dev.state_tuple() == fs_host.state_tuple()

    sub = MLSumcheck.verify(poly.info(), asserted, got)
    assert state.randomness == sub.point
    assert poly.evaluate(sub.point) == sub.expected_evaluation


@pytest.mark.slow
def test_chained_full_roundtrip(chained_cfg, rnd):
    """prove/verify round-trip entirely through the chained path."""
    poly, asserted = random_list_of_products(5, (2, 3), 2, rnd)
    proof = MLSumcheck.prove(poly)
    assert MLSumcheck.extract_sum(proof) == asserted
    sub = MLSumcheck.verify(poly.info(), asserted, proof)
    assert poly.evaluate(sub.point) == sub.expected_evaluation


def test_big_pair_incremental_init_matches_host(rnd, monkeypatch):
    """The >=2GB table path (incremental pair init, pair NOT cached,
    donated into the chain — the nv=24 north-star route) forced at a tiny
    size via the byte threshold: proof bytes must equal the host engine's,
    and repeated proves must re-init (no stale donated cache)."""
    from sumcheck_tpu import Blake2b512Rng, MLSumcheck
    from sumcheck_tpu.ml_sumcheck import serialize_proof
    from sumcheck_tpu.protocol import device_prover as DP
    from sumcheck_tpu.utils.config import get_config

    from conftest import random_list_of_products

    poly, _ = random_list_of_products(6, (2, 3), 2, rnd)
    cfg = get_config()
    saved = (cfg.engine, cfg.chained)
    try:
        cfg.engine, cfg.chained = "host", "off"
        href, _ = MLSumcheck.prove_as_subprotocol(Blake2b512Rng.setup(), poly)
        monkeypatch.setattr(DP, "_BIG_PAIR_BYTES", 1)  # everything is "big"
        cfg.engine, cfg.chained = "device", "on"
        lo, hi, products, degree, reusable = DP.init_pair(poly)
        assert not reusable, "big pairs must not be cached (donated away)"
        p1, _ = MLSumcheck.prove_as_subprotocol(Blake2b512Rng.setup(), poly)
        p2, _ = MLSumcheck.prove_as_subprotocol(Blake2b512Rng.setup(), poly)
    finally:
        cfg.engine, cfg.chained = saved
    assert serialize_proof(p1) == serialize_proof(href)
    assert serialize_proof(p2) == serialize_proof(href)
