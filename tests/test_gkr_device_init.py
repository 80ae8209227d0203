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


def test_segment_reduce_16row_matches_split8(rnd):
    """The 16-row (no-split) segment reduce must equal the 8-bit-split one
    wherever it is eligible, and `_seg_narrow` must refuse it when a
    segment exceeds 2^16 entries (exactness bound)."""
    import jax.numpy as jnp
    import numpy as np

    from sumcheck_tpu.fields import limbs_np as L
    from sumcheck_tpu.ops import gkr_init as GI

    nnz, S = 1500, 64
    seg = np.sort(np.asarray([rnd.randrange(S) for _ in range(nnz)]))
    vals = L.from_ints([rnd.randrange(P) for _ in range(nnz)])
    last = (np.searchsorted(seg, np.arange(S), side="right") - 1).astype(np.int32)
    v = jnp.asarray(vals.astype(np.uint32))
    lp = jnp.asarray(last)
    a = np.asarray(GI._segment_reduce_sorted(v, None, lp, split8=True))
    b = np.asarray(GI._segment_reduce_sorted(v, None, lp, split8=False))
    assert (a == b).all(), "16-row reduce differs from 8-bit split"

    # eligibility: a SparseMLE with > 2^16 duplicate x-collisions must pin
    # split8 on the x axis; small random instances must go narrow
    import random as _r

    from sumcheck_tpu.mle import SparseMLE

    f1 = SparseMLE.rand_with_config(3 * 4, 1 << 4, _r.Random(5))
    GI._split_f1_device(f1, 4)
    nx, ny = GI._seg_narrow(f1)
    assert nx and ny  # 16 entries: trivially narrow


def test_weight_fold_kron_matches_plain(rnd, monkeypatch):
    """The kron-split eq gather (two half-tables + one extra multiply) must
    produce the same weights as the single-table fold — exact field math,
    any association."""
    import jax.numpy as jnp
    import numpy as np

    from sumcheck_tpu.fields import limbs_np as L
    from sumcheck_tpu.ops import gkr_init as GI

    k, nnz = 6, 200
    pts = [Fr(rnd.randrange(P)) for _ in range(k)]
    r_pts, omr_pts = GI._points_arrays(pts)
    idx = np.asarray([rnd.randrange(1 << k) for _ in range(nnz)], np.int32)
    vals = L.from_ints([rnd.randrange(P) for _ in range(nnz)])
    args = (jnp.asarray(idx), jnp.asarray(vals.astype(np.uint32)),
            jnp.asarray(r_pts), jnp.asarray(omr_pts), k)
    plain = np.asarray(GI._weight_fold(*args))      # k < _KRON_MIN_K: 1 table
    monkeypatch.setattr(GI, "_KRON_MIN_K", 2)
    monkeypatch.setattr(GI, "_KRON_MODE", "1")      # take-based split
    kron = np.asarray(GI._weight_fold(*args))       # same k: kron split
    assert (plain == kron).all()
    # the one-hot MXU gather variant must be bit-identical too (8-bit table
    # halves are bf16-exact; a one-hot f32 dot accumulates one term)
    monkeypatch.setattr(GI, "_KRON_MODE", "mxu")
    kron_mxu = np.asarray(GI._weight_fold(*args))
    assert (plain == kron_mxu).all()
    # sorted_idx skips the split under "mxu" (phase-1's near-monotone
    # big-table gather is cheaper than building one-hots) — same result
    sorted_skip = np.asarray(GI._weight_fold(*args, sorted_idx=True))
    assert (plain == sorted_skip).all()
