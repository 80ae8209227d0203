"""Benchmark harness: MLSumcheck prove on the reference's headline workload.

Reference config (`sumcheck-benches/benches/ml_sumcheck_bench.rs:21-31`):
2 products x 3 multiplicands (degree-3 round polynomials), BLS12-381 Fr.
Baseline (BASELINE.md): Intel Xeon 6136 @3.0GHz, prove nv=20 ~= 3.5 s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
where vs_baseline = baseline_seconds / our_seconds (>1 means faster).

Environment:
  BENCH_NV      hypercube size (default 20)
  BENCH_REPS    timed repetitions (default 3; best is reported)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: per-round-size jits survive across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))

from sumcheck_tpu import DenseMLE, Fr, ListOfProductsOfPolynomials, MLSumcheck
from sumcheck_tpu.fields.fr import NUM_DIGITS

BASELINE_PROVE_S = {10: 2.4e-3, 14: 45e-3, 16: 0.2, 20: 3.5, 24: 56.0}


def random_mle(nv: int, rng) -> DenseMLE:
    """Uniform-ish random table directly in strict Montgomery digit form."""
    from sumcheck_tpu.fields import limbs_np as L

    digits = rng.integers(0, 1 << 16, size=(NUM_DIGITS, 1 << nv), dtype=np.uint32)
    digits[NUM_DIGITS - 1] >>= 2  # < 2^254 < p
    return DenseMLE(nv, digits)


def build_poly(nv: int, rng) -> ListOfProductsOfPolynomials:
    poly = ListOfProductsOfPolynomials(nv)
    for _ in range(2):  # 2 products x 3 multiplicands (reference bench cfg)
        mles = [random_mle(nv, rng) for _ in range(3)]
        poly.add_product(mles, Fr(int(rng.integers(1, 1 << 62))))
    return poly


def main() -> None:
    nv = int(os.environ.get("BENCH_NV", "20"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    rng = np.random.default_rng(42)

    poly = build_poly(nv, rng)
    info = poly.info()

    # warmup: one full prove (pays XLA compilation for every round size)
    t0 = time.perf_counter()
    proof = MLSumcheck.prove(poly)
    warm = time.perf_counter() - t0
    print(f"# warmup prove (incl. compile): {warm:.3f}s", file=sys.stderr)

    # verify round-trip while we're here
    sub = MLSumcheck.verify(info, MLSumcheck.extract_sum(proof), proof)
    vt0 = time.perf_counter()
    MLSumcheck.verify(info, MLSumcheck.extract_sum(proof), proof)
    verify_s = time.perf_counter() - vt0
    print(f"# verify: {verify_s*1e3:.2f}ms", file=sys.stderr)

    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        MLSumcheck.prove(poly)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"# prove rep {i}: {dt:.3f}s", file=sys.stderr)

    baseline = BASELINE_PROVE_S.get(nv)
    vs = (baseline / best) if baseline else None
    print(
        json.dumps(
            {
                "metric": f"mlsumcheck_prove_nv{nv}_wallclock",
                "value": round(best, 6),
                "unit": "s",
                "vs_baseline": round(vs, 3) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
