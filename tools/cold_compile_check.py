#!/usr/bin/env python3
"""Cold-compile wall check (VERDICT round-1 item 2, round-2 item 2).

Round 1 compiled one kernel per table size + one transcript step per byte
offset: first-ever nv=20 prove took ~21 min. The shape-generic chained
prover compiles O(1) programs per lane family; this script measures the
true cold wall for BOTH protocols: it moves the persistent compile cache
aside, runs one prove+verify per protocol in a fresh process each, reports
the wall times, and restores the cache (new entries merged on top).

Run: python tools/cold_compile_check.py [ml_nv] [gkr_nv]   (default 20 18)
Prints one JSON object (also written to COLD_COMPILE.json at the repo root):
  {"ml": {"nv": N, "cold_prove_s": T, ...}, "gkr": {...}, "pass_lt_120s": b}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")
ASIDE = os.path.join(REPO, ".jax_cache.aside")

CHILD_ML = r"""
import os, sys, time
import numpy as np
sys.path.insert(0, %(repo)r)
os.environ["JAX_COMPILATION_CACHE_DIR"] = %(cache)r
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
from sumcheck_tpu import DenseMLE, Fr, ListOfProductsOfPolynomials, MLSumcheck
from sumcheck_tpu.fields.fr import NUM_DIGITS

nv = %(nv)d
rng = np.random.default_rng(42)
poly = ListOfProductsOfPolynomials(nv)
for _ in range(2):
    mles = []
    for _ in range(3):
        d = rng.integers(0, 1 << 16, size=(NUM_DIGITS, 1 << nv), dtype=np.uint32)
        d[NUM_DIGITS - 1] >>= 2
        mles.append(DenseMLE(nv, d))
    poly.add_product(mles, Fr(int(rng.integers(1, 1 << 62))))
t0 = time.perf_counter()
proof = MLSumcheck.prove(poly)
dt = time.perf_counter() - t0
MLSumcheck.verify(poly.info(), MLSumcheck.extract_sum(proof), proof)
print("COLD_PROVE_S=%%.3f" %% dt)
"""

CHILD_GKR = r"""
import os, sys, time, random
import numpy as np
sys.path.insert(0, %(repo)r)
os.environ["JAX_COMPILATION_CACHE_DIR"] = %(cache)r
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
from sumcheck_tpu import Blake2b512Rng, DenseMLE, Fr, GKRRoundSumcheck, SparseMLE
from sumcheck_tpu.fields.fr import NUM_DIGITS, P

nv = %(nv)d
rng = np.random.default_rng(42)
prnd = random.Random(7)
f1 = SparseMLE.rand_with_config(3 * nv, 1 << nv, prnd)
def mk():
    d = rng.integers(0, 1 << 16, size=(NUM_DIGITS, 1 << nv), dtype=np.uint32)
    d[NUM_DIGITS - 1] >>= 2
    return DenseMLE(nv, d)
f2, f3 = mk(), mk()
g = [Fr(prnd.randrange(P)) for _ in range(nv)]
t0 = time.perf_counter()
proof = GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
dt = time.perf_counter() - t0
GKRRoundSumcheck.verify(Blake2b512Rng.setup(), nv, proof, proof.extract_sum())
print("COLD_PROVE_S=%%.3f" %% dt)
"""


def run_child(child_src: str, nv: int) -> dict:
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", child_src % {"repo": REPO, "cache": CACHE, "nv": nv}],
        capture_output=True, text=True, timeout=3600,
    )
    wall = time.perf_counter() - t0
    sys.stderr.write(out.stderr[-2000:])
    line = [l for l in out.stdout.splitlines() if l.startswith("COLD_PROVE_S=")]
    cold = float(line[0].split("=")[1]) if line else None
    return {
        "nv": nv,
        "cold_prove_s": cold,
        "process_wall_s": round(wall, 1),
        "pass_lt_120s": bool(cold is not None and cold < 120.0),
    }


def main() -> None:
    ml_nv = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    gkr_nv = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    if os.path.exists(ASIDE):
        shutil.rmtree(ASIDE)
    had_cache = os.path.exists(CACHE)
    if had_cache:
        os.rename(CACHE, ASIDE)
    try:
        # Backend label fetched in a throwaway child: importing jax here
        # would grab libtpu's exclusive per-process device lock in the
        # PARENT, starving both benchmark children on non-tunneled runtimes
        # (ADVICE round-3 medium).
        probe = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "import jax; print(jax.devices()[0])" % REPO],
            capture_output=True, text=True, timeout=600,
        )
        backend = probe.stdout.strip().splitlines()[-1] if probe.stdout else "?"
        res = {"backend": backend, "ml": run_child(CHILD_ML, ml_nv)}
        # fresh process AND a wiped cache again: the GKR cold wall must not
        # ride on programs the ML child just compiled
        ml_aside = CACHE + ".ml"
        if os.path.exists(CACHE):
            res["ml"]["cache_entries"] = len(os.listdir(CACHE))
            os.rename(CACHE, ml_aside)
        res["gkr"] = run_child(CHILD_GKR, gkr_nv)
        if os.path.exists(CACHE):
            res["gkr"]["cache_entries"] = len(os.listdir(CACHE))
        if os.path.exists(ml_aside):
            os.makedirs(CACHE, exist_ok=True)
            for f in os.listdir(ml_aside):
                dst = os.path.join(CACHE, f)
                if not os.path.exists(dst):
                    shutil.move(os.path.join(ml_aside, f), dst)
            shutil.rmtree(ml_aside)
        res["pass_lt_120s"] = bool(
            res["ml"]["pass_lt_120s"] and res["gkr"]["pass_lt_120s"]
        )
        out = json.dumps(res)
        print(out)
        with open(os.path.join(REPO, "COLD_COMPILE.json"), "w") as f:
            f.write(out + "\n")
    finally:
        # merge: fresh-compiled entries win, previously cached ones restored
        if had_cache:
            if os.path.exists(CACHE):
                for f in os.listdir(CACHE):
                    dst = os.path.join(ASIDE, f)
                    if os.path.exists(dst):
                        os.remove(dst)
                    shutil.move(os.path.join(CACHE, f), dst)
                shutil.rmtree(CACHE)
            os.rename(ASIDE, CACHE)


if __name__ == "__main__":
    main()
