"""Throughput-mode batched prover: B instances per fused round, proofs
bit-identical to proving each alone."""

import pytest

from sumcheck_tpu import DenseMLE, Fr, ListOfProductsOfPolynomials, MLSumcheck
from sumcheck_tpu.batch import BatchedMLSumcheck
from sumcheck_tpu.fields.fr import P
from sumcheck_tpu.utils.errors import SumcheckError


def _make(nv, rnd):
    mles = [DenseMLE.rand(nv, rnd) for _ in range(3)]
    poly = ListOfProductsOfPolynomials(nv)
    poly.add_product([mles[0], mles[1]], Fr(rnd.randrange(P)))
    poly.add_product([mles[2], mles[0]], Fr(rnd.randrange(P)))
    return poly


def test_batched_matches_individual(rnd):
    nv, B = 5, 4
    polys = [_make(nv, rnd) for _ in range(B)]
    batched = BatchedMLSumcheck.prove(polys)
    for poly, pf in zip(polys, batched):
        alone = MLSumcheck.prove(poly)
        assert all(a == b for a, b in zip(alone, pf)), "batched proof differs"
        sub = MLSumcheck.verify(poly.info(), MLSumcheck.extract_sum(pf), pf)
        assert poly.evaluate(sub.point) == sub.expected_evaluation


def test_batched_rejects_mixed_shapes(rnd):
    p1 = _make(4, rnd)
    p2 = _make(5, rnd)
    with pytest.raises(SumcheckError):
        BatchedMLSumcheck.prove([p1, p2])


@pytest.mark.slow
def test_batched_chained_matches_individual(rnd):
    """The zero-sync chained batch path (vmapped device transcripts) must be
    byte-identical to per-instance proving."""
    from sumcheck_tpu.utils.config import get_config

    nv, B = 5, 3
    polys = [_make(nv, rnd) for _ in range(B)]
    cfg = get_config()
    old = (cfg.chained, cfg.device_threshold)
    try:
        cfg.chained, cfg.device_threshold = "off", 1 << 40
        refs = [MLSumcheck.prove(p) for p in polys]
        cfg.chained, cfg.device_threshold = "on", 1
        batched = BatchedMLSumcheck.prove(polys)
    finally:
        cfg.chained, cfg.device_threshold = old
    for ref, pf in zip(refs, batched):
        assert all(a == b for a, b in zip(ref, pf)), "chained batch differs"


@pytest.mark.slow
def test_batched_sharded_matches_individual(rnd):
    """Sharded batch (instance axis data-parallel over the mesh) must be
    byte-identical to per-instance proving, across device counts."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from sumcheck_tpu.parallel.mesh import default_mesh
    from sumcheck_tpu.utils.config import get_config

    nv, B = 5, 8
    polys = [_make(nv, rnd) for _ in range(B)]
    cfg = get_config()
    old = (cfg.chained, cfg.device_threshold, cfg.chain_impl)
    try:
        cfg.chained, cfg.device_threshold = "off", 1 << 40
        refs = [MLSumcheck.prove(p) for p in polys]
        cfg.chained, cfg.device_threshold = "on", 1
        cfg.chain_impl = "generic"
        for ndev in [2, 8]:
            batched = BatchedMLSumcheck.prove(polys, mesh=default_mesh(ndev))
            for ref, pf in zip(refs, batched):
                assert all(a == b for a, b in zip(ref, pf)), f"ndev={ndev}"
        with pytest.raises(SumcheckError):
            BatchedMLSumcheck.prove(polys[:3], mesh=default_mesh(2))
    finally:
        cfg.chained, cfg.device_threshold, cfg.chain_impl = old


@pytest.mark.slow
def test_batched_gkr_matches_individual(rnd):
    """Batched GKR (vmapped phase inits + batched generic rounds, one sync)
    must be bit-identical to per-instance GKRRoundSumcheck.prove."""
    from sumcheck_tpu import Blake2b512Rng, DenseMLE as DM, GKRRoundSumcheck, SparseMLE
    from sumcheck_tpu.batch import BatchedGKRRoundSumcheck
    from sumcheck_tpu.utils.config import get_config

    dim, nnz, B = 4, 1 << 4, 3
    # rand_with_config always yields exactly nnz distinct entries
    insts = [
        (SparseMLE.rand_with_config(3 * dim, nnz, rnd),
         DM.rand(dim, rnd), DM.rand(dim, rnd),
         [Fr(rnd.randrange(P)) for _ in range(dim)])
        for _ in range(B)
    ]

    cfg = get_config()
    old = (cfg.engine, cfg.chained, cfg.device_threshold, cfg.chain_impl)
    try:
        cfg.engine = "host"
        refs = [GKRRoundSumcheck.prove(Blake2b512Rng.setup(), *i) for i in insts]
        cfg.engine, cfg.chained, cfg.device_threshold = "device", "on", 1
        cfg.chain_impl = "generic"
        rngs = [Blake2b512Rng.setup() for _ in range(B)]
        proofs = BatchedGKRRoundSumcheck.prove(
            rngs, *(list(t) for t in zip(*insts))
        )
    finally:
        cfg.engine, cfg.chained, cfg.device_threshold, cfg.chain_impl = old
    for ref, pf, inst in zip(refs, proofs, insts):
        for a, b in zip(ref.phase1_sumcheck_msgs + ref.phase2_sumcheck_msgs,
                        pf.phase1_sumcheck_msgs + pf.phase2_sumcheck_msgs):
            assert a == b, "batched GKR proof differs"
        sub = GKRRoundSumcheck.verify(
            Blake2b512Rng.setup(), dim, pf, pf.extract_sum()
        )
        assert sub.verify_subclaim(inst[0], inst[1], inst[2], inst[3])
    # transcript state advanced identically: next draw matches host path
    rng_ref = Blake2b512Rng.setup()
    cfg2 = get_config()
    cfg2.engine = "host"
    try:
        GKRRoundSumcheck.prove(rng_ref, *insts[0])
    finally:
        cfg2.engine = old[0]
    assert Fr.rand(rngs[0]) == Fr.rand(rng_ref)


def test_batched_gkr_mxu_kron_matches_individual(rnd, monkeypatch):
    """The TPU-default mxu kron eq-split under vmap (batched phase inits
    become batched one-hot bf16 dots) must keep batched GKR bit-identical
    to the per-instance host prover."""
    from sumcheck_tpu import Blake2b512Rng, DenseMLE as DM, GKRRoundSumcheck, SparseMLE
    from sumcheck_tpu.batch import BatchedGKRRoundSumcheck
    from sumcheck_tpu.ops import gkr_init as GI
    from sumcheck_tpu.utils.config import get_config

    monkeypatch.setattr(GI, "_KRON_MODE", "mxu")
    monkeypatch.setattr(GI, "_KRON_MIN_K", 2)
    dim, nnz, B = 4, 1 << 4, 2
    insts = [
        (SparseMLE.rand_with_config(3 * dim, nnz, rnd),
         DM.rand(dim, rnd), DM.rand(dim, rnd),
         [Fr(rnd.randrange(P)) for _ in range(dim)])
        for _ in range(B)
    ]
    cfg = get_config()
    old = (cfg.engine, cfg.chained, cfg.device_threshold, cfg.chain_impl)
    try:
        cfg.engine = "host"
        refs = [GKRRoundSumcheck.prove(Blake2b512Rng.setup(), *i) for i in insts]
        cfg.engine, cfg.chained, cfg.device_threshold = "device", "on", 1
        cfg.chain_impl = "generic"
        proofs = BatchedGKRRoundSumcheck.prove(
            [Blake2b512Rng.setup() for _ in range(B)],
            *(list(t) for t in zip(*insts))
        )
    finally:
        cfg.engine, cfg.chained, cfg.device_threshold, cfg.chain_impl = old
    for ref, pf in zip(refs, proofs):
        assert ref.serialize_uncompressed() == pf.serialize_uncompressed()
