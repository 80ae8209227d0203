#!/usr/bin/env python3
"""Per-stage timing of the chained GKR prove (VERDICT round-3 #4: "fresh
on-chip per-stage profile, then attack what it names").

Measurement method — fetch-based differential timing. Through the tunneled
TPU, `block_until_ready` readiness does not reliably reflect device
execution wall (stage sums measured that way disagree with the end-to-end
prove by 2x). Instead every probe ends in a TINY host fetch (np.asarray of
the transcript h-state, 64 B) that data-depends on all prior stages, so its
wall = enqueue + execute-everything + one tunnel round-trip. The pure
round-trip floor (`rtt`) is measured on a no-op chain and subtracted; stage
costs are differences of cumulative prefixes:

  rtt                -> np.asarray of a trivial program's output
  upto_phase1        -> phase1_pair, fetch h
  upto_rounds_p1     -> phase1_pair + dim rounds, fetch h
  upto_phase2        -> + phase2_pair
  upto_rounds_p2     -> + dim rounds
  full_prove         -> GKRRoundSumcheck.prove wall (the real thing)

Run (real TPU): python tools/gkr_profile.py [nv]
Prints one JSON dict; writes GKR_PROFILE.json at the repo root.
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


def wall_best(fn, reps=3):
    fn()  # warm (compile)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
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

    products = ((0, 1),)
    (gbits_d, x, yrev_d, vals_d, perm_x, last_x, perm_y, last_y) = (
        GI._split_f1_device(f1, nv)
    )
    nnz = int(vals_d.shape[1])
    g_r, g_omr = GI._points_arrays(list(g))
    g_r_d, g_omr_d = jnp.asarray(g_r), jnp.asarray(g_omr)
    p1 = GI._compiled_phase1_pair(nnz, nv, GI._mxu_key())
    p2 = GI._compiled_phase2_pair(nnz, nv, GI._mxu_key())

    from sumcheck_tpu.protocol.device_prover import lift_transcript

    ts = lift_transcript(Blake2b512Rng.setup())
    state0 = (ts.h, ts.t, ts.buf, jnp.uint32(ts.blen))

    trivial = jax.jit(lambda a: a + 1)
    _ = np.asarray(trivial(state0[0]))  # compile

    def probe_rtt():
        return np.asarray(trivial(state0[0]))

    def run(depth: int):
        """Execute the prove pipeline to `depth`, then fetch 64 B that
        depends on everything executed so far."""
        lo1, hi1, w = p1(gbits_d, perm_x, last_x, yrev_d, vals_d,
                         g_r_d, g_omr_d, f3.device_bitrev(), f2.device_bitrev())
        if depth == 1:
            # ONE fetch: lo1 and hi1 come from the same program execution
            return np.asarray(lo1[0, :, :1])
        H0 = lo1.shape[2]
        lo1, hi1 = pad_pair(lo1, hi1)
        parts1, state, pair1, r_last = chain_rounds_generic(
            lo1, hi1, state0, products, 2, nv, donate=False, active_pairs=H0
        )
        if depth == 2:
            return np.asarray(state[0])
        rs1_dev = jnp.concatenate([rs[:n] for _m, rs, n in parts1], axis=0)
        lo2, hi2 = p2(pair1[0][:, :, :1], pair1[1][:, :, :1], r_last,
                      x, perm_y, last_y, w, rs1_dev, f3.device_bitrev())
        if depth == 3:
            return np.asarray(lo2[0, :, :1])  # depends on p1+rounds1+p2
        lo2, hi2 = pad_pair(lo2, hi2)
        parts2, state, _pair2, _r = chain_rounds_generic(
            lo2, hi2, state, products, 2, nv, donate=False, active_pairs=H0
        )
        return np.asarray(state[0])

    stages: dict[str, float] = {}
    stages["rtt"] = wall_best(probe_rtt)
    stages["upto_phase1"] = wall_best(lambda: run(1))
    stages["upto_rounds_p1"] = wall_best(lambda: run(2))
    stages["upto_phase2"] = wall_best(lambda: run(3))
    stages["upto_rounds_p2"] = wall_best(lambda: run(4))

    def full():
        return GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)

    stages["full_prove"] = wall_best(full)

    r = stages
    derived = {
        "phase1_pair": r["upto_phase1"] - r["rtt"],
        "rounds_p1": r["upto_rounds_p1"] - r["upto_phase1"],
        "phase2_pair": r["upto_phase2"] - r["upto_rounds_p1"],
        "rounds_p2": r["upto_rounds_p2"] - r["upto_phase2"],
        "fetch_and_host": r["full_prove"] - (r["upto_rounds_p2"] - r["rtt"]),
    }
    out = {
        "nv": nv,
        "backend": jax.default_backend(),
        **{k: round(v, 5) for k, v in stages.items()},
        "derived": {k: round(v, 5) for k, v in derived.items()},
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "GKR_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
