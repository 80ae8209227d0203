"""GKR round sumcheck tests, mirroring the reference suite
(`src/gkr_round_sumcheck/test.rs`): naive O(4^dim) oracle, prove/verify
round-trip with subclaim verification, sum extraction."""

import pytest

from sumcheck_tpu import (
    Blake2b512Rng,
    DenseMLE,
    Fr,
    GKRRoundSumcheck,
    Reject,
    SparseMLE,
)
from sumcheck_tpu.fields.fr import P
from sumcheck_tpu.gkr_round_sumcheck import (
    initialize_phase_one,
    initialize_phase_two,
)


def random_gkr_instance(dim, rnd):
    return (
        SparseMLE.rand_with_config(dim * 3, 1 << dim, rnd),
        DenseMLE.rand(dim, rnd),
        DenseMLE.rand(dim, rnd),
    )


def calculate_sum_naive(f1, f2, f3, g):
    """O(4^dim) oracle (reference `test.rs:24-45`)."""
    dim = f2.num_vars
    assert f1.num_vars == 3 * dim and f3.num_vars == dim
    f1_g = f1.fix_variables(list(g)).to_dense().to_fr_list()
    f2l, f3l = f2.to_fr_list(), f3.to_fr_list()
    total = Fr.zero()
    for x in range(1 << dim):
        for y in range(1 << dim):
            total = total + f1_g[x + (y << dim)] * f2l[x] * f3l[y]
    return total


def check_circuit(dim, rnd):
    f1, f2, f3 = random_gkr_instance(dim, rnd)
    g = [Fr(rnd.randrange(P)) for _ in range(dim)]
    claimed = calculate_sum_naive(f1, f2, f3, g)
    rng = Blake2b512Rng.setup()
    proof = GKRRoundSumcheck.prove(rng, f1, f2, f3, g)
    rng = Blake2b512Rng.setup()
    subclaim = GKRRoundSumcheck.verify(rng, f2.num_vars, proof, claimed)
    assert subclaim.verify_subclaim(f1, f2, f3, g)


def test_small(rnd):
    check_circuit(5, rnd)


@pytest.mark.slow
def test_medium(rnd):
    check_circuit(7, rnd)


def test_extract(rnd):
    dim = 4
    f1, f2, f3 = random_gkr_instance(dim, rnd)
    g = [Fr(rnd.randrange(P)) for _ in range(dim)]
    expected = calculate_sum_naive(f1, f2, f3, g)
    rng = Blake2b512Rng.setup()
    proof = GKRRoundSumcheck.prove(rng, f1, f2, f3, g)
    assert proof.extract_sum() == expected


def test_reject_wrong_sum(rnd):
    dim = 4
    f1, f2, f3 = random_gkr_instance(dim, rnd)
    g = [Fr(rnd.randrange(P)) for _ in range(dim)]
    claimed = calculate_sum_naive(f1, f2, f3, g)
    rng = Blake2b512Rng.setup()
    proof = GKRRoundSumcheck.prove(rng, f1, f2, f3, g)
    rng = Blake2b512Rng.setup()
    with pytest.raises(Reject):
        GKRRoundSumcheck.verify(rng, f2.num_vars, proof, claimed + Fr.one())


def test_phase_one_matches_naive(rnd):
    """h_g(x) == sum_y f1(g,x,y) * f3(y) computed the slow way."""
    dim = 3
    f1, _f2, f3 = random_gkr_instance(dim, rnd)
    g = [Fr(rnd.randrange(P)) for _ in range(dim)]
    h_g, f1_g = initialize_phase_one(f1, f3, g)
    f1_g_dense = f1_g.to_dense().to_fr_list()
    f3l = f3.to_fr_list()
    for x in range(1 << dim):
        expect = Fr.zero()
        for y in range(1 << dim):
            expect = expect + f1_g_dense[x + (y << dim)] * f3l[y]
        assert h_g[x] == expect, x


def test_phase_two_matches_naive(rnd):
    dim = 3
    f1, _f2, _f3 = random_gkr_instance(dim, rnd)
    g = [Fr(rnd.randrange(P)) for _ in range(dim)]
    u = [Fr(rnd.randrange(P)) for _ in range(dim)]
    f1_g = f1.fix_variables(g)
    f1_gu = initialize_phase_two(f1_g, u)
    direct = f1.fix_variables(g + u).to_dense()
    assert f1_gu.to_fr_list() == direct.to_fr_list()


def test_gkr_proof_serde_round_trip(rnd):
    """GKRProof byte round-trip; the deserialized proof re-verifies and
    malformed encodings raise SerializationError."""
    import pytest

    from sumcheck_tpu import Blake2b512Rng
    from sumcheck_tpu.gkr_round_sumcheck import GKRProof, GKRRoundSumcheck
    from sumcheck_tpu.utils.errors import SerializationError

    dim = 3
    f1, f2, f3 = random_gkr_instance(dim, rnd)
    g = [Fr(rnd.randrange(P)) for _ in range(dim)]
    proof = GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
    blob = proof.serialize_uncompressed()
    back = GKRProof.deserialize_uncompressed(blob)
    assert back.serialize_uncompressed() == blob
    sub = GKRRoundSumcheck.verify(
        Blake2b512Rng.setup(), dim, back, back.extract_sum()
    )
    assert sub.verify_subclaim(f1, f2, f3, g)
    with pytest.raises(SerializationError):
        GKRProof.deserialize_uncompressed(blob + b"\x00")
    with pytest.raises(SerializationError):
        GKRProof.deserialize_uncompressed(blob[:-1])
    with pytest.raises(SerializationError):
        GKRProof.deserialize_uncompressed(bytes(16))  # zero rounds
