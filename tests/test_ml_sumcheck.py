"""MLSumcheck protocol tests, mirroring the reference suite
(`src/ml_sumcheck/test.rs`, SURVEY.md §4 patterns 1-6): randomized
round-trips with self-computed ground truth, interactive mode, subprotocol
transcripts (incl. negative), edge-case errors, sum extraction, dedup."""


import pytest

from sumcheck_tpu import (
    Blake2b512Rng,
    DenseMLE,
    Fr,
    IPForMLSumcheck,
    ListOfProductsOfPolynomials,
    MLSumcheck,
    Reject,
    SumcheckError,
)
from sumcheck_tpu.fields.fr import P

from conftest import random_list_of_products


def check_polynomial(nv, mm_range, num_products, rnd):
    poly, asserted_sum = random_list_of_products(nv, mm_range, num_products, rnd)
    info = poly.info()
    proof = MLSumcheck.prove(poly)
    subclaim = MLSumcheck.verify(info, asserted_sum, proof)
    assert poly.evaluate(subclaim.point) == subclaim.expected_evaluation, "wrong subclaim"


def check_interactive(nv, mm_range, num_products, rnd):
    """Raw interactive rounds with a live RNG (reference `test_protocol`,
    `test.rs:77-97`) — the L4-only entry point."""
    poly, asserted_sum = random_list_of_products(nv, mm_range, num_products, rnd)
    info = poly.info()
    prover_state = IPForMLSumcheck.prover_init(poly)
    verifier_state = IPForMLSumcheck.verifier_init(info)
    rng = Blake2b512Rng.setup()
    rng.feed(b"interactive test")
    verifier_msg = None
    for _ in range(poly.num_variables):
        prover_msg = IPForMLSumcheck.prove_round(prover_state, verifier_msg)
        verifier_msg = IPForMLSumcheck.verify_round(prover_msg, verifier_state, rng)
    subclaim = IPForMLSumcheck.check_and_generate_subclaim(verifier_state, asserted_sum)
    assert poly.evaluate(subclaim.point) == subclaim.expected_evaluation, "wrong subclaim"


def check_subprotocol(nv, mm_range, num_products, rnd, prover_rng, verifier_rng):
    poly, asserted_sum = random_list_of_products(nv, mm_range, num_products, rnd)
    info = poly.info()
    proof, prover_state = MLSumcheck.prove_as_subprotocol(prover_rng, poly)
    subclaim = MLSumcheck.verify_as_subprotocol(verifier_rng, info, asserted_sum, proof)
    assert poly.evaluate(subclaim.point) == subclaim.expected_evaluation, "wrong subclaim"
    assert prover_state.randomness == subclaim.point


def test_trivial_polynomial(rnd):
    # nv=1 with many multiplicands (reference `test_trivial_polynomial`)
    for _ in range(4):
        check_polynomial(1, (4, 13), 5, rnd)
        check_interactive(1, (4, 13), 5, rnd)
        prover_rng = Blake2b512Rng.setup()
        prover_rng.feed(b"Test Trivial Works")
        verifier_rng = Blake2b512Rng.setup()
        verifier_rng.feed(b"Test Trivial Works")
        check_subprotocol(1, (4, 13), 5, rnd, prover_rng, verifier_rng)


def test_normal_polynomial(rnd):
    for _ in range(2):
        check_polynomial(7, (4, 9), 3, rnd)
        check_interactive(7, (4, 9), 3, rnd)
        prover_rng = Blake2b512Rng.setup()
        prover_rng.feed(b"Test Trivial Works")
        verifier_rng = Blake2b512Rng.setup()
        verifier_rng.feed(b"Test Trivial Works")
        check_subprotocol(7, (4, 9), 3, rnd, prover_rng, verifier_rng)


def test_normal_polynomial_nv12(rnd):
    """Reference-scale instance in the DEFAULT lane (reference
    `test.rs:145-167`: nv=12, 4-9 multiplicands x 5 products). Runs on the
    host engine — table length 2^12 sits at the CPU host/device crossover,
    and the point here is protocol correctness at reference scale, not
    XLA compile time (VERDICT round-3 ask #9)."""
    from sumcheck_tpu.utils.config import get_config

    cfg = get_config()
    saved = cfg.engine
    cfg.engine = "host"
    try:
        check_polynomial(12, (4, 9), 5, rnd)
    finally:
        cfg.engine = saved


def test_different_transcripts_fail(rnd):
    prover_rng = Blake2b512Rng.setup()
    prover_rng.feed(b"Test Trivial Works")
    verifier_rng = Blake2b512Rng.setup()
    verifier_rng.feed(b"Test Trivial Fails")
    with pytest.raises((Reject, AssertionError)):
        check_subprotocol(6, (4, 9), 2, rnd, prover_rng, verifier_rng)


def test_zero_polynomial_should_error(rnd):
    with pytest.raises(SumcheckError):
        check_polynomial(0, (4, 13), 5, rnd)
    with pytest.raises(SumcheckError):
        check_interactive(0, (4, 13), 5, rnd)


def test_extract_sum(rnd):
    poly, asserted_sum = random_list_of_products(6, (3, 4), 3, rnd)
    proof = MLSumcheck.prove(poly)
    assert MLSumcheck.extract_sum(proof) == asserted_sum


def test_reject_wrong_sum(rnd):
    poly, asserted_sum = random_list_of_products(5, (2, 4), 2, rnd)
    proof = MLSumcheck.prove(poly)
    with pytest.raises(Reject):
        MLSumcheck.verify(poly.info(), asserted_sum + Fr.one(), proof)


def test_incomplete_proof_errors(rnd):
    poly, asserted_sum = random_list_of_products(5, (2, 4), 2, rnd)
    proof = MLSumcheck.prove(poly)
    with pytest.raises((IndexError, SumcheckError)):
        MLSumcheck.verify(poly.info(), asserted_sum, proof[:-1])


def test_shared_reference(rnd):
    """Memory is linear in unique tables, not multiplicand slots
    (reference `test_shared_reference`, `test.rs:215-269`)."""
    mles = [DenseMLE.rand(8, rnd) for _ in range(5)]
    poly = ListOfProductsOfPolynomials(8)
    poly.add_product([mles[2], mles[3], mles[0]], Fr(rnd.randrange(P)))
    poly.add_product([mles[1], mles[4], mles[4]], Fr(rnd.randrange(P)))
    poly.add_product([mles[3], mles[2], mles[1]], Fr(rnd.randrange(P)))
    poly.add_product([mles[0], mles[0]], Fr(rnd.randrange(P)))
    poly.add_product([mles[4]], Fr(rnd.randrange(P)))

    assert len(poly.flattened_ml_extensions) == 5
    prover = IPForMLSumcheck.prover_init(poly)
    assert len(prover.flattened_ml_extensions) == 5

    info = poly.info()
    proof = MLSumcheck.prove(poly)
    asserted_sum = MLSumcheck.extract_sum(proof)
    subclaim = MLSumcheck.verify(info, asserted_sum, proof)
    assert poly.evaluate(subclaim.point) == subclaim.expected_evaluation


def test_prover_misuse_errors(rnd):
    poly, _ = random_list_of_products(3, (2, 3), 1, rnd)
    state = IPForMLSumcheck.prover_init(poly)
    from sumcheck_tpu.protocol.verifier import VerifierMsg

    # verifier message in round 0
    with pytest.raises(SumcheckError):
        IPForMLSumcheck.prove_round(state, VerifierMsg(Fr(1)))
    # missing verifier message after round 0
    IPForMLSumcheck.prove_round(state, None)
    with pytest.raises(SumcheckError):
        IPForMLSumcheck.prove_round(state, None)
    # prover not active after nv rounds
    for _ in range(poly.num_variables - 1):
        IPForMLSumcheck.prove_round(state, VerifierMsg(Fr(rnd.randrange(P))))
    with pytest.raises(SumcheckError):
        IPForMLSumcheck.prove_round(state, VerifierMsg(Fr(rnd.randrange(P))))


@pytest.mark.slow
def test_device_engine_matches_host(rnd):
    """The jitted device round path must emit bit-identical proofs to the
    vectorized host path (determinism across engines substitutes for the
    reference's race-freedom guarantees, SURVEY.md §5)."""
    from sumcheck_tpu.utils.config import get_config

    nv = 3
    tabs = [[rnd.randrange(P) for _ in range(1 << nv)] for _ in range(3)]

    def build():
        mles = [DenseMLE.from_evaluations(nv, t) for t in tabs]
        poly = ListOfProductsOfPolynomials(nv)
        poly.add_product([mles[0], mles[1]], Fr(123))
        poly.add_product([mles[2], mles[0]], Fr(456))
        return poly

    cfg = get_config()
    old = cfg.engine
    try:
        cfg.engine = "host"
        p_host = MLSumcheck.prove(build())
        cfg.engine = "device"
        p_dev = MLSumcheck.prove(build())
    finally:
        cfg.engine = old
    assert all(a == b for a, b in zip(p_host, p_dev))


def test_proof_serde_round_trip(rnd):
    """`deserialize_proof(serialize_proof(p))` reproduces the proof, and the
    deserialized bytes re-verify; malformed encodings raise
    `SerializationError` (reference: `Proof` derives CanonicalSerialize +
    CanonicalDeserialize, `ml_sumcheck/mod.rs:22`)."""
    import pytest

    from sumcheck_tpu.ml_sumcheck import deserialize_proof, serialize_proof
    from sumcheck_tpu.utils.errors import SerializationError

    poly, s = random_list_of_products(4, (2, 4), 2, rnd)
    proof = MLSumcheck.prove(poly)
    blob = serialize_proof(proof)
    back = deserialize_proof(blob)
    assert serialize_proof(back) == blob
    sub = MLSumcheck.verify(poly.info(), s, back)
    assert poly.evaluate(sub.point) == sub.expected_evaluation
    with pytest.raises(SerializationError):
        deserialize_proof(blob + b"\x00")
    with pytest.raises(SerializationError):
        # non-canonical Fr encoding (>= p)
        deserialize_proof(blob[:8] + b"\xff" * (len(blob) - 8))
