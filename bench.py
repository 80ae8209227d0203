"""Benchmark harness for the reference's headline workloads.

Modes (BENCH_PROTO):
  ml      MLSumcheck prove, 2 products x 3 multiplicands (degree-3 rounds) —
          reference `sumcheck-benches/benches/ml_sumcheck_bench.rs:21-31`.
  gkr     GKRRoundSumcheck prove, sparse f1 with 2^nv nonzeros over 3nv vars —
          reference `gkr_round_sumcheck_bench.rs:21-23`.
  batch   Throughput mode: BENCH_BATCH independent instances per chip.

Baseline (BASELINE.md): Intel Xeon 6136 @3.0GHz.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
with vs_baseline = baseline_seconds / our_seconds (>1 means faster).

Environment: BENCH_NV (default 20 ml / 18 gkr / 16 batch), BENCH_REPS
(default 3; best rep reported), BENCH_BATCH (default 8).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: per-round-size jits survive across runs
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from sumcheck_tpu import (
    Blake2b512Rng,
    DenseMLE,
    Fr,
    GKRRoundSumcheck,
    ListOfProductsOfPolynomials,
    MLSumcheck,
    SparseMLE,
)
from sumcheck_tpu.fields.fr import NUM_DIGITS, P

# chart-read reference numbers (BASELINE.md; +-15%); nv>20 extrapolated on
# the charts' 2x-per-variable slope (the prover is linear in 2^nv)
BASELINE_ML_PROVE_S = {10: 2.4e-3, 14: 45e-3, 16: 0.2, 18: 0.9, 20: 3.5, 22: 14.0, 24: 56.0}
BASELINE_GKR_PROVE_S = {10: 2.5e-3, 14: 50e-3, 16: 0.22, 18: 0.95, 20: 3.8, 22: 15.2}


def random_mle(nv: int, rng) -> DenseMLE:
    """Uniform-ish random table directly in strict Montgomery digit form."""
    digits = rng.integers(0, 1 << 16, size=(NUM_DIGITS, 1 << nv), dtype=np.uint32)
    digits[NUM_DIGITS - 1] >>= 2  # < 2^254 < p
    return DenseMLE(nv, digits)


def build_ml_poly(nv: int, rng) -> ListOfProductsOfPolynomials:
    poly = ListOfProductsOfPolynomials(nv)
    for _ in range(2):  # 2 products x 3 multiplicands (reference bench cfg)
        mles = [random_mle(nv, rng) for _ in range(3)]
        poly.add_product(mles, Fr(int(rng.integers(1, 1 << 62))))
    return poly


def bench_ml(nv: int, reps: int, rng):
    poly = build_ml_poly(nv, rng)
    info = poly.info()
    t0 = time.perf_counter()
    proof = MLSumcheck.prove(poly)
    print(f"# warmup prove (incl. compile): {time.perf_counter()-t0:.3f}s", file=sys.stderr)
    sub = MLSumcheck.verify(info, MLSumcheck.extract_sum(proof), proof)
    vt0 = time.perf_counter()
    MLSumcheck.verify(info, MLSumcheck.extract_sum(proof), proof)
    print(f"# verify: {(time.perf_counter()-vt0)*1e3:.2f}ms", file=sys.stderr)
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        MLSumcheck.prove(poly)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"# prove rep {i}: {dt:.3f}s", file=sys.stderr)
    return f"mlsumcheck_prove_nv{nv}_wallclock", best, BASELINE_ML_PROVE_S.get(nv)


def bench_gkr(nv: int, reps: int, rng):
    import random

    prnd = random.Random(7)
    f1 = SparseMLE.rand_with_config(3 * nv, 1 << nv, prnd)
    f2, f3 = random_mle(nv, rng), random_mle(nv, rng)
    g = [Fr(prnd.randrange(P)) for _ in range(nv)]
    t0 = time.perf_counter()
    proof = GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
    print(f"# warmup prove (incl. compile): {time.perf_counter()-t0:.3f}s", file=sys.stderr)
    vt0 = time.perf_counter()
    GKRRoundSumcheck.verify(Blake2b512Rng.setup(), nv, proof, proof.extract_sum())
    print(f"# verify: {(time.perf_counter()-vt0)*1e3:.2f}ms", file=sys.stderr)
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"# prove rep {i}: {dt:.3f}s", file=sys.stderr)
    return f"gkr_round_sumcheck_prove_nv{nv}_wallclock", best, BASELINE_GKR_PROVE_S.get(nv)


def bench_batch(nv: int, reps: int, rng, batch: int):
    from sumcheck_tpu.batch import BatchedMLSumcheck

    polys = [build_ml_poly(nv, rng) for _ in range(batch)]
    t0 = time.perf_counter()
    BatchedMLSumcheck.prove(polys)
    print(f"# warmup batch (incl. compile): {time.perf_counter()-t0:.3f}s", file=sys.stderr)
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        BatchedMLSumcheck.prove(polys)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"# batch rep {i}: {dt:.3f}s per {batch} proofs", file=sys.stderr)
    per = best / batch
    base = BASELINE_ML_PROVE_S.get(nv)
    return f"batched{batch}_mlsumcheck_prove_nv{nv}_per_proof", per, base


def main() -> None:
    proto = os.environ.get("BENCH_PROTO", "ml")
    reps = int(os.environ.get("BENCH_REPS", "3"))
    rng = np.random.default_rng(42)
    if proto == "gkr":
        nv = int(os.environ.get("BENCH_NV", "18"))
        metric, best, baseline = bench_gkr(nv, reps, rng)
    elif proto == "batch":
        nv = int(os.environ.get("BENCH_NV", "16"))
        batch = int(os.environ.get("BENCH_BATCH", "8"))
        metric, best, baseline = bench_batch(nv, reps, rng, batch)
    else:
        nv = int(os.environ.get("BENCH_NV", "20"))
        metric, best, baseline = bench_ml(nv, reps, rng)
    vs = (baseline / best) if baseline else None
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(best, 6),
                "unit": "s",
                "vs_baseline": round(vs, 3) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
