#!/usr/bin/env python3
"""Batch operating-surface sweep (VERDICT round-4 ask #5).

BASELINE config 4 ("many independent instances packed per chip") had exactly
one measured point — 8 x nv=16 — and the per-proof number halved when the
batch block default changed, so the operating surface was under-explored.
This sweeps B x nv for `BatchedMLSumcheck` (and B for `BatchedGKRRoundSumcheck`)
on the real chip and writes the grid to BATCH_SWEEP.json; the batch_block
default in `utils/config.py` cites the winner.

Per point: one warmup prove (compile; the persistent cache amortizes shapes
across runs), then best + median of BENCH_REPS (default 5) proves.

Run (real TPU): python tools/batch_sweep.py
Env: BATCH_GRID_B="4,8,16,32" BATCH_GRID_NV="12,14,16" BENCH_REPS=5
     BATCH_GKR_B="4,8" BATCH_GKR_NV=14
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from sumcheck_tpu import Blake2b512Rng, DenseMLE, Fr, ListOfProductsOfPolynomials, SparseMLE  # noqa: E402
from sumcheck_tpu.batch import BatchedGKRRoundSumcheck, BatchedMLSumcheck  # noqa: E402
from sumcheck_tpu.fields.fr import NUM_DIGITS, P  # noqa: E402

# chart-read reference walls (BASELINE.md; single-instance prove at nv)
BASELINE_ML = {10: 2.4e-3, 12: 11e-3, 14: 45e-3, 16: 0.2, 18: 0.9, 20: 3.5}
BASELINE_GKR = {10: 2.5e-3, 12: 12e-3, 14: 50e-3, 16: 0.22, 18: 0.95}

rng = np.random.default_rng(42)


def random_mle(nv: int) -> DenseMLE:
    d = rng.integers(0, 1 << 16, size=(NUM_DIGITS, 1 << nv), dtype=np.uint32)
    d[NUM_DIGITS - 1] >>= 2
    return DenseMLE(nv, d)


def build_poly(nv: int) -> ListOfProductsOfPolynomials:
    poly = ListOfProductsOfPolynomials(nv)
    for _ in range(2):  # the reference ML bench config
        poly.add_product([random_mle(nv) for _ in range(3)],
                         Fr(int(rng.integers(1, 1 << 62))))
    return poly


def measure(label: str, prove, reps: int) -> dict:
    t0 = time.perf_counter()
    prove()
    warm = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        prove()
        times.append(time.perf_counter() - t0)
    times.sort()
    row = {"warmup_s": round(warm, 3), "best_s": round(times[0], 6),
           "median_s": round(statistics.median(times), 6)}
    print(f"# {label}: {row}", file=sys.stderr, flush=True)
    return row


def main() -> None:
    reps = int(os.environ.get("BENCH_REPS", "5"))
    bs = [int(x) for x in os.environ.get("BATCH_GRID_B", "4,8,16,32").split(",")]
    nvs = [int(x) for x in os.environ.get("BATCH_GRID_NV", "12,14,16").split(",")]
    gkr_bs = [int(x) for x in os.environ.get("BATCH_GKR_B", "4,8").split(",")]
    gkr_nv = int(os.environ.get("BATCH_GKR_NV", "14"))

    out = {"ml_rows": [], "gkr_rows": [], "reps": reps}
    path = os.path.join(os.path.dirname(__file__), "..", "BATCH_SWEEP.json")

    def flush():
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    for nv in nvs:
        for B in bs:
            try:
                polys = [build_poly(nv) for _ in range(B)]
                row = measure(f"ml B={B} nv={nv}",
                              lambda: BatchedMLSumcheck.prove(polys), reps)
                per = row["best_s"] / B
                out["ml_rows"].append({
                    "proto": "ml", "B": B, "nv": nv, **row,
                    "per_proof_s": round(per, 6),
                    "vs_baseline": round(BASELINE_ML[nv] / per, 3),
                })
            except Exception as e:  # noqa: BLE001 — a point outside the
                # operating envelope (e.g. B=32 overruns the batched
                # program's VMEM budget) is a FINDING, not a sweep abort
                out["ml_rows"].append({
                    "proto": "ml", "B": B, "nv": nv,
                    "error": repr(e)[:300],
                })
                print(f"# ml B={B} nv={nv} FAILED: {e!r}"[:200],
                      file=sys.stderr, flush=True)
            flush()

    import random as _random

    prnd = _random.Random(11)
    for B in gkr_bs:
        insts = [
            (SparseMLE.rand_with_config(3 * gkr_nv, 1 << gkr_nv, prnd),
             random_mle(gkr_nv), random_mle(gkr_nv),
             [Fr(prnd.randrange(P)) for _ in range(gkr_nv)])
            for _ in range(B)
        ]
        args = [list(t) for t in zip(*insts)]

        def prove():
            rngs = [Blake2b512Rng.setup() for _ in range(B)]
            return BatchedGKRRoundSumcheck.prove(rngs, *args)

        try:
            row = measure(f"gkr B={B} nv={gkr_nv}", prove, reps)
            per = row["best_s"] / B
            out["gkr_rows"].append({
                "proto": "gkr", "B": B, "nv": gkr_nv, **row,
                "per_proof_s": round(per, 6),
                "vs_baseline": round(BASELINE_GKR[gkr_nv] / per, 3),
            })
        except Exception as e:  # noqa: BLE001 — record the envelope edge
            out["gkr_rows"].append({
                "proto": "gkr", "B": B, "nv": gkr_nv, "error": repr(e)[:300],
            })
            print(f"# gkr B={B} nv={gkr_nv} FAILED: {e!r}"[:200],
                  file=sys.stderr, flush=True)
        flush()

    best16 = max((r for r in out["ml_rows"]
                  if r["nv"] == 16 and "vs_baseline" in r),
                 key=lambda r: r["vs_baseline"], default=None)
    if best16:
        out["best_nv16"] = {"B": best16["B"],
                            "per_proof_s": best16["per_proof_s"],
                            "vs_baseline": best16["vs_baseline"]}
    flush()
    print(json.dumps(out.get("best_nv16", {})))


if __name__ == "__main__":
    main()
