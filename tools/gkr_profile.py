#!/usr/bin/env python3
"""Per-stage timing of the chained GKR prove (VERDICT.md round-1 item 4:
"bottleneck documented"). Times, with persistent jits and block_until_ready:

  - phase-1 init (weight fold via eq table + f3 gather + sorted segment sum)
  - prep1 (bitrev + pair split)
  - one phase-1 round chain (2*dim generic masked rounds happen per prove;
    here the full chain is timed as a unit)
  - phase-2 init (weight fold + segment sum from device challenge digits)
  - whole prove (end to end, warm)

Run (real TPU): python tools/gkr_profile.py [nv]
Prints a JSON dict of stage -> seconds (best of 3).
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
    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.default_rng(42)
    prnd = random.Random(7)
    f1 = SparseMLE.rand_with_config(3 * nv, 1 << nv, prnd)
    digits = rng.integers(0, 1 << 16, size=(NUM_DIGITS, 1 << nv), dtype=np.uint32)
    digits[NUM_DIGITS - 1] >>= 2
    f2 = DenseMLE(nv, digits.copy())
    f3 = DenseMLE(nv, digits[:, ::-1].copy())
    g = [Fr(prnd.randrange(P)) for _ in range(nv)]

    stages: dict[str, float] = {}

    stages["phase1_init"] = best_of(
        lambda: GI.phase1_init_device_arrays(f1, f3, g, nv)[0]
    )
    hg, (x, perm_y, last_y, w) = GI.phase1_init_device_arrays(f1, f3, g, nv)
    jax.block_until_ready(hg)

    stages["prep1"] = best_of(lambda: GI._compiled_prep1(nv)(hg, f2.device_bitrev()))

    u_digits = jnp.asarray(
        np.stack([np.squeeze(np.asarray(jnp.ones((NUM_DIGITS,), jnp.uint32)))
                  for _ in range(nv)])
    )  # placeholder digit rows (any strict value works for timing)
    stages["phase2_init"] = best_of(
        lambda: GI._compiled_phase2_digits(int(x.shape[0]), nv)(
            x, perm_y, last_y, w, u_digits
        )
    )

    def full():
        return GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)

    full()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        full()
        best = min(best, time.perf_counter() - t0)
    stages["full_prove"] = best
    stages["rounds_est"] = stages["full_prove"] - stages["phase1_init"] - stages[
        "phase2_init"
    ] - stages["prep1"]
    print(json.dumps({k: round(v, 5) for k, v in stages.items()}))


if __name__ == "__main__":
    main()
