#!/usr/bin/env python3
"""Cold-compile wall check (VERDICT.md round-1 item 2).

Round 1 compiled one kernel per table size + one transcript step per byte
offset: first-ever nv=20 prove took ~21 min. The shape-generic chained
prover compiles O(1) programs per lane family; this script measures the
true cold wall: it moves the persistent compile cache aside, runs one
nv=NV MLSumcheck prove+verify in a fresh process, reports the wall time,
and restores the cache (new entries merged on top).

Run: python tools/cold_compile_check.py [nv]   (default 20)
Prints one JSON line {"nv": N, "cold_prove_s": T, "pass_lt_120s": bool}.
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

CHILD = r"""
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


def main() -> None:
    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    if os.path.exists(ASIDE):
        shutil.rmtree(ASIDE)
    had_cache = os.path.exists(CACHE)
    if had_cache:
        os.rename(CACHE, ASIDE)
    try:
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": REPO, "cache": CACHE, "nv": nv}],
            capture_output=True, text=True, timeout=3600,
        )
        wall = time.perf_counter() - t0
        sys.stderr.write(out.stderr[-2000:])
        line = [l for l in out.stdout.splitlines() if l.startswith("COLD_PROVE_S=")]
        cold = float(line[0].split("=")[1]) if line else None
        print(json.dumps({
            "nv": nv,
            "cold_prove_s": cold,
            "process_wall_s": round(wall, 1),
            "pass_lt_120s": bool(cold is not None and cold < 120.0),
        }))
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
