#!/usr/bin/env python3
"""Per-stage timing of the chained GKR prove (VERDICT round-2 #3 / round-3
#4: "fresh on-chip per-stage profile, then attack what it names").

Profiles the GENERIC chained path (`chain_impl=generic` — the configuration
the driver bench runs): each stage is one of the prove's actual dispatch
units, timed warm with block_until_ready:

  - phase1_pair: fused phase-1 init (weight fold + f3 gather + sorted
    segment reduce) + pair prep                  (ops/gkr_init.py)
  - rounds_p1:   ALL dim phase-1 rounds (first + big chain + tail chain,
    incl. the on-device Fiat-Shamir transcript)  (protocol/generic_prover.py)
  - phase2_pair: fused final-fold + phase-2 init + pair prep
  - rounds_p2:   ALL dim phase-2 rounds
  - fetch:       the single host transfer
  - transcript_est: serial-floor estimate — rounds in a tail chain whose
    masked block is tiny are ~pure transcript; scaled to 2*dim rounds
  - full_prove:  end-to-end warm GKRRoundSumcheck.prove

Run (real TPU): python tools/gkr_profile.py [nv]
Prints a JSON dict and writes GKR_PROFILE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sumcheck_tpu import Blake2b512Rng, DenseMLE, Fr, GKRRoundSumcheck, SparseMLE  # noqa: E402
from sumcheck_tpu.fields.fr import NUM_DIGITS, P  # noqa: E402
from sumcheck_tpu.ops import gkr_init as GI  # noqa: E402
from sumcheck_tpu.protocol.generic_prover import chain_rounds_generic, pad_pair  # noqa: E402


def best_of(fn, reps=3):
    out = fn()  # warm (compile)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    rng = np.random.default_rng(42)
    prnd = random.Random(7)
    f1 = SparseMLE.rand_with_config(3 * nv, 1 << nv, prnd)
    digits = rng.integers(0, 1 << 16, size=(NUM_DIGITS, 1 << nv), dtype=np.uint32)
    digits[NUM_DIGITS - 1] >>= 2
    f2 = DenseMLE(nv, digits.copy())
    f3 = DenseMLE(nv, digits[:, ::-1].copy())
    g = [Fr(prnd.randrange(P)) for _ in range(nv)]

    stages: dict[str, float] = {}
    products = ((0, 1),)

    (gbits_d, x, yrev_d, vals_d, perm_x, last_x, perm_y, last_y) = (
        GI._split_f1_device(f1, nv)
    )
    nnz = int(vals_d.shape[1])
    g_r, g_omr = GI._points_arrays(list(g))
    p1 = GI._compiled_phase1_pair(nnz, nv, GI._mxu_key())

    def phase1():
        return p1(gbits_d, perm_x, last_x, yrev_d, vals_d, jnp.asarray(g_r),
                  jnp.asarray(g_omr), f3.device_bitrev(), f2.device_bitrev())

    stages["phase1_pair"] = best_of(phase1)
    lo1, hi1, w = phase1()
    H0 = lo1.shape[2]
    lo1p, hi1p = pad_pair(lo1, hi1)
    jax.block_until_ready((lo1p, hi1p))

    from sumcheck_tpu.protocol.device_prover import lift_transcript

    ts = lift_transcript(Blake2b512Rng.setup())
    state0 = (ts.h, ts.t, ts.buf, jnp.uint32(ts.blen))

    def rounds_p1():
        parts, state, pair, r = chain_rounds_generic(
            lo1p + 0, hi1p + 0, state0, products, 2, nv,
            donate=False, active_pairs=H0,
        )
        return parts[-1][0], state

    stages["rounds_p1"] = best_of(rounds_p1)

    parts1, state1, pair1, r_last = chain_rounds_generic(
        lo1p + 0, hi1p + 0, state0, products, 2, nv,
        donate=False, active_pairs=H0,
    )
    rs1_dev = jnp.concatenate([rs[:n] for _m, rs, n in parts1], axis=0)
    p2 = GI._compiled_phase2_pair(nnz, nv, GI._mxu_key())

    def phase2():
        return p2(pair1[0][:, :, :1], pair1[1][:, :, :1], r_last,
                  x, perm_y, last_y, w, rs1_dev, f3.device_bitrev())

    stages["phase2_pair"] = best_of(phase2)
    lo2, hi2 = phase2()
    lo2p, hi2p = pad_pair(lo2, hi2)
    jax.block_until_ready((lo2p, hi2p))

    def rounds_p2():
        parts, state, _pair, _r = chain_rounds_generic(
            lo2p + 0, hi2p + 0, state1, products, 2, nv,
            donate=False, active_pairs=H0,
        )
        return parts[-1][0], state

    stages["rounds_p2"] = best_of(rounds_p2)

    from sumcheck_tpu.protocol.generic_prover import _fetch

    parts2, state2, _pair2, _ = chain_rounds_generic(
        lo2p + 0, hi2p + 0, state1, products, 2, nv,
        donate=False, active_pairs=H0,
    )

    def fetch():
        return _fetch(parts1 + parts2, state2, 2)[0]

    stages["fetch"] = best_of(fetch)

    # transcript serial floor: run a tail-sized chain (extent < tail block,
    # table math ~nil) for k rounds; per-round cost ~= transcript + one tiny
    # masked block. Scale to the prove's 2*nv rounds.
    k = min(8, nv)
    from sumcheck_tpu.protocol.generic_prover import _TAIL_BLOCK, _chain_step

    cstep = _chain_step(int(lo1p.shape[2]), 2, products, 2, _TAIL_BLOCK, False)
    r0 = jnp.zeros((NUM_DIGITS,), jnp.uint32)

    def tailchain():
        return cstep(lo1p + 0, hi1p + 0, jnp.uint32(64), jnp.int32(k), r0,
                     *state0)[2]

    t_tail = best_of(tailchain)
    stages["transcript_est"] = (t_tail / k) * (2 * nv)

    def full():
        return GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)

    full()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        full()
        best = min(best, time.perf_counter() - t0)
    stages["full_prove"] = best
    stages["stage_sum"] = (
        stages["phase1_pair"] + stages["rounds_p1"] + stages["phase2_pair"]
        + stages["rounds_p2"] + stages["fetch"]
    )
    out = {
        "nv": nv,
        "backend": jax.default_backend(),
        **{kk: round(vv, 5) for kk, vv in stages.items()},
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "GKR_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
