"""Speed-of-light model for the prover round kernels (BASELINE.json north
star: "every round kernel measured against speed-of-light limb-multiply
throughput per chip").

Two rooflines bound a prove; both are *measured* on the live chip (not
quoted from specs) by `measure_roofline`:

- **Montgomery-multiply rate** (primary): throughput of the exact CIOS
  kernel the rounds run (16x16-bit digits, `fields/limbs_jnp._cios_body`:
  512 u32 multiplies + ~2200 adds/shifts/masks per lane), timed as an
  unrolled chain of dependent mont_muls over 2^20 lanes. A synthetic u32
  mul+add rate is also recorded for reference, but generic chains and the
  real CIOS op mix schedule too differently on the VPU to compare fairly.
- HBM: the fused round step streams the active table extent once in and the
  folded halves once out; bandwidth measured with a copy kernel.

SOL seconds = max(mont_muls / mont_rate, bytes / hbm_bw); %SOL = SOL / achieved.
Op counts are analytic from the algorithm (`prover.rs:110-132` semantics):
round i has A2 = 2^(nv-1-i) active pairs; fold costs U*2*A2 mont_muls
(U = table slots), evaluation costs P*(L-1)*(d+1)*A2 (P products padded to
L multiplicands, coefficients pre-folded — `device_prover._fold_plan`).
"""

from __future__ import annotations

import json
import os
import time

# u32 vector-op budget of one lane of mont_mul (CIOS digit schedule)
MULS_PER_MONT = 512
OPS_PER_MONT = 2720  # total u32 ALU ops incl. the multiplies
LANE_BYTES = 64  # one field element: 16 digits x uint32


def count_prove_ops(nv: int, num_slots: int, num_products: int,
                    max_len: int, degree: int) -> dict:
    """Analytic mont_mul / byte totals for one chained prove."""
    mont = 0
    bytes_moved = 0
    H = 1 << (nv - 1)
    for i in range(nv):
        a2 = H >> i
        if i > 0:
            mont += num_slots * 2 * a2          # fold both half-stripes
            bytes_moved += 6 * a2 * num_slots * LANE_BYTES  # r 4 stripes, w 2
        else:
            bytes_moved += 2 * a2 * num_slots * LANE_BYTES  # sums read only
        mont += num_products * (max_len - 1) * (degree + 1) * a2
    return {
        "mont_muls": mont,
        "u32_muls": mont * MULS_PER_MONT,
        "u32_ops": mont * OPS_PER_MONT,
        "hbm_bytes": bytes_moved,
    }


def count_gkr_prove_ops(nv: int, nnz: int) -> dict:
    """Analytic totals for one chained GKR prove (dim = nv).

    Mont-multiply census of the device path (`gkr_round_sumcheck._prove_chained`):
    - phase-1 init (`ops/gkr_init._compiled_phase1`): eq-table build by
      doublings ~2*2^nv, weight fold 1*nnz, f3-gather multiply 1*nnz;
    - phase-2 init (`_compiled_phase2_digits`): eq build ~2*2^nv + 1*nnz;
    - prep2 f2(u) scaling: 1*2^nv;
    - two dim-round chains, U=2 slots, 1 product x 2 multiplicands, degree 2:
      per round `fold 2*2*A2 + eval 3*A2` with `sum A2 ~ 2^nv` per chain
      (round 0 folds nothing) => ~2 * (7 - 2) * 2^nv.
    HBM: the chains stream the pair ~6x extent/round (as in `count_prove_ops`)
    plus the two init pipelines' dominant streams (sorted gather + 32-row
    8-bit cumsum + boundary gathers ~ 6 passes of 128 B/entry each).
    """
    n = 1 << nv
    mont = 3 * nnz + (2 + 2 + 1 + 10) * n
    chain_bytes = 2 * (6 * 2 * n * 2 * LANE_BYTES)  # 2 chains, U=2 slots
    init_bytes = 2 * (6 * 128 * nnz)
    return {
        "mont_muls": mont,
        "u32_muls": mont * MULS_PER_MONT,
        "u32_ops": mont * OPS_PER_MONT,
        "hbm_bytes": chain_bytes + init_bytes,
    }


_CACHE_PATH = os.path.join(os.path.dirname(__file__), "..", "..", ".sol_roofline.json")


def measure_roofline(force: bool = False) -> dict:
    """Measure the current backend's rooflines; cached per backend in
    `.sol_roofline.json`.

    Method (round 4): every probe is a K-iteration `fori_loop` chain inside
    ONE jit, timed by a tiny (64 B) fetch with the separately-measured
    tunnel round-trip subtracted — per-op cost = (wall - rtt) / K. The
    previous method timed whole-array-output kernels with
    `block_until_ready` and no RTT subtraction; through the tunneled
    backend that under-reported the Montgomery rate ~12x (78 M/s vs the
    ~1 G/s the same op measures RTT-corrected), which is how committed
    sweeps ended up with pct_sol > 100%."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    backend = jax.default_backend()
    cache = {}
    if os.path.exists(_CACHE_PATH):
        try:
            cache = json.load(open(_CACHE_PATH))
        except (OSError, json.JSONDecodeError):
            cache = {}
    if not force and backend in cache:
        return cache[backend]

    def wall_best(fn, reps=5):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    trivial = jax.jit(lambda t: t + 1)
    small = jnp.zeros((8,), jnp.uint32)
    np.asarray(trivial(small))
    rtt = wall_best(lambda: np.asarray(trivial(small)))

    from ..fields import limbs_jnp as LJ

    rng = np.random.default_rng(0)
    n = 1 << 18
    K = 64  # ~25-50 ms of signal vs +-3 ms tunnel-RTT noise

    @jax.jit
    def mont_chain(a, b):
        def body(i, x):
            return LJ.mont_mul(x, b)
        return jax.lax.fori_loop(0, K, body, a)

    a = jnp.asarray(rng.integers(0, 1 << 14, size=(16, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 14, size=(16, n), dtype=np.uint32))
    np.asarray(mont_chain(a, b)[0, :1])
    w = wall_best(lambda: np.asarray(mont_chain(a, b)[0, :1]))
    mont_per_s = K * n / max(w - rtt, 1e-6)

    UNROLL = 64  # in-iteration unroll keeps the ALU probe compute-bound

    @jax.jit
    def alu_chain(x, y):
        def body(i, x):
            for _ in range(UNROLL):
                x = x * y + jnp.uint32(1)
            return x
        return jax.lax.fori_loop(0, K, body, x)

    xa = jnp.arange(1 << 22, dtype=jnp.uint32)
    yb = jnp.full((1 << 22,), 3, jnp.uint32)
    np.asarray(alu_chain(xa, yb)[:1])
    w = wall_best(lambda: np.asarray(alu_chain(xa, yb)[:1]))
    alu_ops_per_s = 2.0 * UNROLL * K * xa.size / max(w - rtt, 1e-6)

    KH = 16

    @jax.jit
    def hbm_chain(x):
        def body(i, x):
            return x + jnp.uint32(1)  # one read + one write per iteration
        return jax.lax.fori_loop(0, KH, body, x)

    big = jnp.zeros((1 << 26,), jnp.uint32)  # 256 MiB
    np.asarray(hbm_chain(big)[:1])
    w = wall_best(lambda: np.asarray(hbm_chain(big)[:1]))
    hbm_bytes_per_s = KH * 2.0 * big.size * 4 / max(w - rtt, 1e-6)

    result = {
        "u32_ops_per_s": alu_ops_per_s,
        "hbm_bytes_per_s": hbm_bytes_per_s,
        "mont_muls_per_s": mont_per_s,
        "rtt_s": rtt,
    }
    cache[backend] = result
    try:
        json.dump(cache, open(_CACHE_PATH, "w"), indent=1)
    except OSError:
        pass
    return result


def sol_seconds(counts: dict, roofline: dict) -> dict:
    """SOL = the time back-to-back measured-rate Montgomery multiplies (the
    primary, directly-measured roofline) or the HBM stream — whichever
    binds. The synthetic u32-op rate is kept for reference only: generic
    mul+add chains and the real CIOS op mix schedule very differently."""
    mont_s = counts["mont_muls"] / roofline["mont_muls_per_s"]
    hbm_s = counts["hbm_bytes"] / roofline["hbm_bytes_per_s"]
    return {
        "mont_bound_s": mont_s,
        "hbm_bound_s": hbm_s,
        "sol_s": max(mont_s, hbm_s),
        "bound": "mont" if mont_s >= hbm_s else "hbm",
    }
