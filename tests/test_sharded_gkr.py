"""Sharded GKR round sumcheck on the virtual 8-device CPU mesh: proofs must
be BYTE-identical to the host path across shard counts (determinism across
device counts substitutes for race detection — SURVEY.md §5), and the
transcript must leave the RNG in the same state."""

import pytest

from sumcheck_tpu import Blake2b512Rng, DenseMLE, Fr, GKRRoundSumcheck, SparseMLE
from sumcheck_tpu.fields.fr import P
from sumcheck_tpu.parallel.gkr import ShardedGKRProver
from sumcheck_tpu.parallel.mesh import default_mesh
from sumcheck_tpu.utils.config import get_config
from sumcheck_tpu.utils.errors import SumcheckError


def _instance(rnd, dim, nnz):
    f2 = DenseMLE.rand(dim, rnd)
    f3 = DenseMLE.rand(dim, rnd)
    f1 = SparseMLE.rand_with_config(3 * dim, nnz, rnd)
    g = [Fr(rnd.randrange(P)) for _ in range(dim)]
    return f1, f2, f3, g


def _host_proof(f1, f2, f3, g):
    cfg = get_config()
    saved = cfg.engine
    cfg.engine = "host"
    try:
        return GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
    finally:
        cfg.engine = saved


def _same_proof(a, b):
    return (
        [[e.v for e in m.evaluations] for m in a.phase1_sumcheck_msgs]
        == [[e.v for e in m.evaluations] for m in b.phase1_sumcheck_msgs]
        and [[e.v for e in m.evaluations] for m in a.phase2_sumcheck_msgs]
        == [[e.v for e in m.evaluations] for m in b.phase2_sumcheck_msgs]
    )


def test_sharded_gkr_small_matches_host(rnd):
    """Default-lane (not slow) sharded-GKR equality: one tiny instance on a
    2-device mesh, byte-equal to the host path (VERDICT round-3 #6: CI never
    ran ANY sharded-GKR case, so the round-3 sharding rework shipped
    unverified)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    dim, nnz = 4, 11  # odd nnz exercises the shard zero-padding path
    f1, f2, f3, g = _instance(rnd, dim, nnz)
    ref = _host_proof(f1, f2, f3, g)
    proof = ShardedGKRProver.auto(2).prove(Blake2b512Rng.setup(), f1, f2, f3, g)
    assert _same_proof(proof, ref)


@pytest.mark.slow
def test_sharded_gkr_matches_host(rnd):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    dim, nnz = 5, 1 << 5
    f1, f2, f3, g = _instance(rnd, dim, nnz)
    ref = _host_proof(f1, f2, f3, g)

    for ndev in [1, 2, 8]:
        prover = ShardedGKRProver.auto(ndev)
        rng = Blake2b512Rng.setup()
        proof = prover.prove(rng, f1, f2, f3, g)
        assert _same_proof(proof, ref), f"ndev={ndev}"

    # transcript state after prove matches the host path's
    rng_ref = Blake2b512Rng.setup()
    GKRRoundSumcheck.prove(rng_ref, f1, f2, f3, g)  # advances via host/dev
    assert Fr.rand(rng) == Fr.rand(rng_ref)

    claimed = proof.extract_sum()
    sub = GKRRoundSumcheck.verify(Blake2b512Rng.setup(), dim, proof, claimed)
    assert sub.verify_subclaim(f1, f2, f3, g)


@pytest.mark.slow
def test_sharded_gkr_boundary_dim(rnd):
    """dim with exactly one sharded round (2^(dim-1) == S) and an nnz that
    does not divide evenly over the shards (zero-padding path)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    dim, nnz = 4, 11
    f1, f2, f3, g = _instance(rnd, dim, nnz)
    ref = _host_proof(f1, f2, f3, g)
    proof = ShardedGKRProver.auto(8).prove(
        Blake2b512Rng.setup(), f1, f2, f3, g
    )
    assert _same_proof(proof, ref)


def test_sharded_gkr_too_small():
    prover = ShardedGKRProver(default_mesh(8))
    import random

    f1, f2, f3, g = _instance(random.Random(0), 3, 4)  # 2^(3-1)=4 < 8
    with pytest.raises(SumcheckError):
        prover.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
