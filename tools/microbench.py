#!/usr/bin/env python3
"""On-chip microbenchmarks of the GKR/ML building blocks, to direct
optimization (VERDICT round-3 #4). Fetch-based timing: every probe jits a
loop of K ops and ends in a 64 B fetch; cost = (wall - rtt) / K.

Probes:
  compress      one Blake2b F on the device transcript state
  fr_rand       one full challenge (feed 3 Fr + rejection-sampled draw)
  gather16      arbitrary-index row gather of a (16, 2^nv) u32 table
  cumsum32      (32, 2^nv) u32 cumsum along lanes (segment-reduce core)
  mont_nnz      one (16, 2^nv) elementwise Montgomery multiply
  eq_build      the 2^nv eq-table doubling build
  segreduce     full _segment_reduce_sorted at nnz = 2^nv

Run: python tools/microbench.py [nv]   (default 18)
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sumcheck_tpu.fields import limbs_jnp as LJ  # noqa: E402
from sumcheck_tpu.fields.fr import NUM_DIGITS, P  # noqa: E402


def wall_best(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << nv
    rng = np.random.default_rng(0)
    res: dict = {"nv": nv}

    trivial = jax.jit(lambda a: a + 1)
    seed = jnp.zeros((8, 2), jnp.uint32)
    np.asarray(trivial(seed))
    rtt = wall_best(lambda: np.asarray(trivial(seed)))
    res["rtt"] = rtt

    # --- transcript ---------------------------------------------------------
    from sumcheck_tpu.transcript.device import compress, fr_rand_dyn, feed_fr_vec_dyn

    K = 64

    @jax.jit
    def compress_chain(h, m, t):
        def body(i, hh):
            return compress(hh, m, t + i, last=False)
        return jax.lax.fori_loop(0, K, body, h)

    m = jnp.zeros((16, 2), jnp.uint32)
    t0 = jnp.uint32(128)
    np.asarray(compress_chain(seed, m, t0))
    w = wall_best(lambda: np.asarray(compress_chain(seed, m, t0)))
    res["compress_us"] = (w - rtt) / K * 1e6

    KC = 16

    @jax.jit
    def challenge_chain(h, t, buf, blen, canon):
        def body(i, carry):
            h, t, buf, blen = carry
            st = feed_fr_vec_dyn((h, t, buf, blen), canon)
            digits, st = fr_rand_dyn(st)
            # fold the digits back into the canon feed so rounds chain
            return st
        return jax.lax.fori_loop(0, KC, body, (h, t, buf, blen))

    canon = jnp.zeros((NUM_DIGITS, 3), jnp.uint32)
    buf0 = jnp.zeros((16, 2), jnp.uint32)
    args = (seed, jnp.uint32(0), buf0, jnp.uint32(0), canon)
    np.asarray(challenge_chain(*args)[0])
    w = wall_best(lambda: np.asarray(challenge_chain(*args)[0]))
    res["challenge_us"] = (w - rtt) / KC * 1e6

    # --- gathers / scans ----------------------------------------------------
    tbl = jnp.asarray(rng.integers(0, 1 << 16, size=(NUM_DIGITS, n), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, n, size=(n,), dtype=np.int32))

    KG = 8

    @jax.jit
    def gather_chain(tbl, idx):
        def body(i, acc):
            return acc + jnp.take(tbl, (idx + i) % n, axis=1)
        return jax.lax.fori_loop(0, KG, body, jnp.zeros_like(tbl))

    np.asarray(gather_chain(tbl, idx)[0, :1])
    w = wall_best(lambda: np.asarray(gather_chain(tbl, idx)[0, :1]))
    res["gather16_ms"] = (w - rtt) / KG * 1e3

    rows32 = jnp.asarray(rng.integers(0, 256, size=(32, n), dtype=np.uint32))

    @jax.jit
    def cumsum_chain(a):
        def body(i, acc):
            return jnp.cumsum(acc, axis=1, dtype=jnp.uint32)
        return jax.lax.fori_loop(0, KG, body, a)

    np.asarray(cumsum_chain(rows32)[0, :1])
    w = wall_best(lambda: np.asarray(cumsum_chain(rows32)[0, :1]))
    res["cumsum32_ms"] = (w - rtt) / KG * 1e3

    b = jnp.asarray(rng.integers(0, 1 << 16, size=(NUM_DIGITS, n), dtype=np.uint32))

    @jax.jit
    def mont_chain(a, b):
        def body(i, acc):
            return LJ.mont_mul(acc, b)
        return jax.lax.fori_loop(0, KG, body, a)

    np.asarray(mont_chain(tbl, b)[0, :1])
    w = wall_best(lambda: np.asarray(mont_chain(tbl, b)[0, :1]))
    res["mont_nnz_ms"] = (w - rtt) / KG * 1e3

    # --- eq build + full segment reduce ------------------------------------
    from sumcheck_tpu.ops.gkr_init import (
        _eq_table,
        _points_arrays,
        _segment_reduce_sorted,
    )
    from sumcheck_tpu.fields.fr import Fr

    import random as _random

    prnd = _random.Random(3)
    pts = [Fr(prnd.randrange(P)) for _ in range(nv)]
    r_pts, omr_pts = _points_arrays(pts)
    r_d, omr_d = jnp.asarray(r_pts), jnp.asarray(omr_pts)

    @jax.jit
    def eq_build(r, omr):
        return _eq_table(r, omr, nv)

    np.asarray(eq_build(r_d, omr_d)[0, :1])
    w = wall_best(lambda: np.asarray(eq_build(r_d, omr_d)[0, :1]))
    res["eq_build_ms"] = (w - rtt) * 1e3

    seg = np.sort(rng.integers(0, n, size=(n,), dtype=np.int32))
    perm = np.argsort(seg, kind="stable").astype(np.int32)
    last = (np.searchsorted(seg[perm], np.arange(n), side="right") - 1).astype(np.int32)
    perm_d, last_d = jnp.asarray(perm), jnp.asarray(last)

    @jax.jit
    def segred(vals, perm, last):
        return _segment_reduce_sorted(vals, perm, last)

    np.asarray(segred(tbl, perm_d, last_d)[0, :1])
    w = wall_best(lambda: np.asarray(segred(tbl, perm_d, last_d)[0, :1]))
    res["segreduce_ms"] = (w - rtt) * 1e3

    out = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in res.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
