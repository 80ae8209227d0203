#!/usr/bin/env python3
"""A/B the fold implementations of the generic chain on the live backend.

Three variants of the same nv=NV MLSumcheck prove (identical proof bytes,
asserted): fused Pallas VPU body / jnp body with VPU CIOS fold / jnp body
with the MXU banded-matmul fold (`ops/mxu_mul`). Variant choice is part of
the compiled-program cache key, so in-process switching is sound.

Run: python tools/mxu_ab.py [nv]   (default 20)
Writes MXU_AB.json at the repo root (VERDICT round-2 #7 / round-3 #8:
"decide the MXU fold with data — committed A/B + default reflecting it").
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("MXU_AB_CPU"):  # local smoke-testing without the chip
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from sumcheck_tpu import DenseMLE, Fr, ListOfProductsOfPolynomials, MLSumcheck  # noqa: E402
from sumcheck_tpu.fields.fr import NUM_DIGITS  # noqa: E402
from sumcheck_tpu.ml_sumcheck import serialize_proof  # noqa: E402
from sumcheck_tpu.utils.config import get_config  # noqa: E402


def main() -> None:
    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.default_rng(42)
    poly = ListOfProductsOfPolynomials(nv)
    for _ in range(2):
        mles = []
        for _ in range(3):
            digits = rng.integers(0, 1 << 16, size=(NUM_DIGITS, 1 << nv), dtype=np.uint32)
            digits[NUM_DIGITS - 1] >>= 2
            mles.append(DenseMLE(nv, digits))
        poly.add_product(mles, Fr(int(rng.integers(1, 1 << 62))))

    cfg = get_config()
    cfg.engine = "device"  # force the chained device path at every size
    variants = [
        ("pallas_vpu", {"pallas": "auto", "mxu_fold": "off"}),
        ("jnp_vpu", {"pallas": "off", "mxu_fold": "off"}),
        ("jnp_mxu", {"pallas": "off", "mxu_fold": "on"}),
        ("pallas_mxu_kernel", {"pallas": "auto", "mxu_fold": "kernel"}),
    ]
    ref = None
    results: dict = {"nv": nv}
    for name, flags in variants:
        saved = {k: getattr(cfg, k) for k in flags}
        for k, v in flags.items():
            setattr(cfg, k, v)
        try:
            t0 = time.perf_counter()
            proof = MLSumcheck.prove(poly)
            warm = time.perf_counter() - t0
            b = serialize_proof(proof)
            if ref is None:
                ref = b
            assert b == ref, f"{name}: proof bytes diverge"
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                MLSumcheck.prove(poly)
                best = min(best, time.perf_counter() - t0)
            print(f"{name}: nv={nv} prove {best:.4f}s (warmup {warm:.1f}s)")
            results[name] = {"prove_s": round(best, 5), "warmup_s": round(warm, 1)}
        except Exception as e:  # noqa: BLE001 — record, keep A/B-ing the rest
            print(f"{name}: FAILED {e!r}")
            results[name] = {"error": repr(e)[:300]}
        finally:
            for k, v in saved.items():
                setattr(cfg, k, v)
    timed = {k: v["prove_s"] for k, v in results.items()
             if isinstance(v, dict) and "prove_s" in v}
    if timed:
        results["winner"] = min(timed, key=timed.get)
    out = os.path.join(os.path.dirname(__file__), "..", "MXU_AB.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
