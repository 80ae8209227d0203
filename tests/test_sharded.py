"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: the stand-in for the reference's nonexistent multi-node
story). The sharded prover must produce proofs BIT-IDENTICAL to the
single-device engine — determinism across device counts substitutes for race
detection (SURVEY.md §5)."""

import numpy as np
import pytest

from sumcheck_tpu import Blake2b512Rng, DenseMLE, Fr, ListOfProductsOfPolynomials, MLSumcheck
from conftest import random_list_of_products
from sumcheck_tpu.fields.fr import P
from sumcheck_tpu.parallel.mesh import (
    default_mesh,
    from_sharded_layout,
    sharded_perm,
    to_sharded_layout,
)
from sumcheck_tpu.parallel.prover import ShardedProver


def test_sharded_perm_roundtrip():
    for nv, k in [(3, 0), (4, 2), (6, 3)]:
        arr = np.arange(16 * (1 << nv), dtype=np.uint32).reshape(16, 1 << nv)
        back = from_sharded_layout(to_sharded_layout(arr, nv, k), nv, k)
        assert (back == arr).all()
    # k=0 must match plain bitrev
    from sumcheck_tpu.protocol.prover import to_bitrev

    arr = np.arange(16 * 8, dtype=np.uint32).reshape(16, 8)
    assert (to_sharded_layout(arr, 3, 0) == to_bitrev(arr, 3)).all()


def test_sharded_pairing_is_local():
    """Fold pairs (2b, 2b+1) must live in the same shard block, as the first
    and second half of the block."""
    nv, k = 5, 2
    n, shards = 1 << nv, 1 << k
    m = n // shards
    perm = sharded_perm(nv, k)
    for b in range(n // 2):
        p0, p1 = perm[2 * b], perm[2 * b + 1]
        assert p0 // m == p1 // m, "pair crosses shard"
        assert p1 - p0 == m // 2, "pair not half-offset within shard"


@pytest.mark.slow
def test_sharded_prove_matches_single(rnd):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    nv = 6
    tabs = [[rnd.randrange(P) for _ in range(1 << nv)] for _ in range(2)]

    def build():
        mles = [DenseMLE.from_evaluations(nv, t) for t in tabs]
        poly = ListOfProductsOfPolynomials(nv)
        poly.add_product([mles[0], mles[1]], Fr(7))
        return poly

    single = MLSumcheck.prove(build())

    from sumcheck_tpu.utils.config import get_config

    cfg = get_config()
    old = cfg.device_threshold
    try:
        cfg.device_threshold = 1  # force real shard_map rounds at tiny sizes
        prover = ShardedProver(default_mesh(8))
        sharded = prover.prove(build())
    finally:
        cfg.device_threshold = old
    assert all(a == b for a, b in zip(single, sharded)), "sharded proof differs"

    sub = MLSumcheck.verify(build().info(), MLSumcheck.extract_sum(sharded), sharded)
    assert build().evaluate(sub.point) == sub.expected_evaluation


@pytest.mark.slow
def test_chained_sharded_prove_matches_single(rnd):
    """Chained sharded prove (device transcript inside shard_map, one sync)
    is byte-identical to the host path, across 1/2/4/8-device meshes."""
    from sumcheck_tpu.ml_sumcheck import serialize_proof
    from sumcheck_tpu.parallel.chained import ChainedShardedProver
    from sumcheck_tpu.utils.config import get_config

    nv = 6
    poly, total = random_list_of_products(nv, (2, 4), 2, rnd)
    cfg = get_config()
    saved = cfg.engine
    cfg.engine = "host"
    try:
        ref = MLSumcheck.prove(poly)
    finally:
        cfg.engine = saved

    for ndev in [1, 2, 8]:
        prover = ChainedShardedProver.auto(ndev)
        rng = Blake2b512Rng.setup()
        proof, state = prover.prove_as_subprotocol(rng, poly)
        assert serialize_proof(proof) == serialize_proof(ref), f"ndev={ndev}"
        sub = MLSumcheck.verify(poly.info(), total, proof)
        assert [r.v for r in state.randomness] == [r.v for r in sub.point]
