"""Device GKR phase-init kernels vs the host path (bit-identical results,
including deliberately colliding scatter indices)."""

import pytest

from sumcheck_tpu import Blake2b512Rng, DenseMLE, Fr, GKRRoundSumcheck, SparseMLE
from sumcheck_tpu.fields.fr import P
from sumcheck_tpu.gkr_round_sumcheck import initialize_phase_one, initialize_phase_two
from sumcheck_tpu.ops.gkr_init import phase1_init_device, phase2_init_device


def test_phase_inits_match_host(rnd):
    dim = 3
    # dense-ish sparse instance: lots of scatter collisions
    f1 = SparseMLE.rand_with_config(3 * dim, 3 * (1 << dim), rnd)
    f3 = DenseMLE.rand(dim, rnd)
    g = [Fr(rnd.randrange(P)) for _ in range(dim)]
    u = [Fr(rnd.randrange(P)) for _ in range(dim)]

    h_host, f1g_host = initialize_phase_one(f1, f3, g)
    h_dev, carry = phase1_init_device(f1.indices, f1.values, f3.evals, g, dim)
    assert (h_dev == h_host.evals).all(), "phase-1 h_g differs"

    f2_host = initialize_phase_two(f1g_host, u)
    f2_dev = phase2_init_device(carry, u, dim)
    assert (f2_dev == f2_host.evals).all(), "phase-2 f1_gu differs"


@pytest.mark.slow
def test_gkr_prove_device_init_matches(rnd):
    """Full GKR prove with the device init path forced must produce the same
    proof as the host path."""
    from sumcheck_tpu.utils.config import get_config

    dim = 4
    f1 = SparseMLE.rand_with_config(3 * dim, 1 << dim, rnd)
    f2, f3 = DenseMLE.rand(dim, rnd), DenseMLE.rand(dim, rnd)
    g = [Fr(rnd.randrange(P)) for _ in range(dim)]

    cfg = get_config()
    old = cfg.engine
    try:
        cfg.engine = "host"
        p_host = GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
        cfg.engine = "device"
        p_dev = GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
    finally:
        cfg.engine = old
    for a, b in zip(
        p_host.phase1_sumcheck_msgs + p_host.phase2_sumcheck_msgs,
        p_dev.phase1_sumcheck_msgs + p_dev.phase2_sumcheck_msgs,
    ):
        assert a == b, "device-init GKR proof differs"
