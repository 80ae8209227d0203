"""Shape-generic chained prover: ONE compiled program for every round.

The per-size chained path (`device_prover.py`) compiles a kernel per table
size and a transcript step per pending-byte offset — ~36 programs for an
nv=20 prove, a ~20-minute cold-compile wall on a tunneled TPU where each
program costs 20-60 s to compile (VERDICT.md round-1 weakness #1).

This module re-architects the round as a single jitted step whose *shapes*
are fixed (full-size table buffers, fixed block size) and whose *active
extent* is a traced scalar:

- the (lo, hi) pair buffers keep their allocation for the whole prove; the
  active pair count `A2` halves each round (`A2 = H >> round`);
- fold + round-polynomial evaluation run as a `fori_loop` over fixed-size
  lane blocks at dynamic offsets (`dynamic_slice`/`dynamic_update_slice`),
  so per-round work stays proportional to the active extent — the total is
  still the reference's linear-time `~2*2^nv` (`prover.rs:74-153`), not
  `nv*2^nv`;
- rounds smaller than a block take a masked single-slab path;
- the Fiat-Shamir feed/sample runs with a *dynamic* pending-byte count
  (`transcript/device.absorb_dyn`), eliminating the per-offset programs.

The driver enqueues all `nv` calls of the same program asynchronously and
synchronizes once at the end, exactly like the per-size chain. Proof bytes
are bit-identical to the host path (same sums, same transcript schedule).

Pair-form invariant (see `ops/round_pallas.py` docstring): the bit-reversed
table T of length 2A is carried as lo = T[:A], hi = T[A:]; fold produces
folded[k] = lo[k] + r*(hi[k]-lo[k]) and the new pair (folded[:A/2],
folded[A/2:]) feeds the evaluation ladder directly.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields import limbs_jnp as LJ
from ..fields.fr import Fr, NUM_DIGITS, P, R_INV
from ..transcript.device import feed_fr_vec_dyn, fr_rand_dyn
from .device_prover import (
    _ONE_DIGITS,
    col_int,
    init_pair,
    lift_transcript,
    msgs_from_host,
    restore_transcript,
)


def _use_pallas_chain(block: int | None = None) -> bool:
    """Body choice for the generic chain, per BLOCK WIDTH.

    Measured on the v5e (tools/mxu_ab.py, MXU_AB.json, round 4): at the
    nv=20 reference workload the XLA-fused jnp body proves in 0.128 s vs
    0.213 s for the hand-written Pallas body (identical proof bytes) — XLA's
    fusion of the wide fold+evaluate+reduce blocks beats the handwritten
    kernel 1.66x. But the same flip cost GKR nv=18 0.111 -> 0.132 s: its 36
    mostly sub-block rounds are DISPATCH-bound, and there the single fused
    kernel launch beats the ~300-HLO jnp body ~2x per round. So `auto` is a
    hybrid: jnp for the wide (ALU-bound) chains, Pallas for the narrow tail
    chain (block <= _TAIL_BLOCK). `on`/`off` force one body everywhere."""
    import jax

    from ..utils.config import get_config

    cfg = get_config()
    if cfg.pallas == "on":  # forced (interpret mode off-TPU — tests only)
        return True
    if cfg.pallas == "off":
        return False
    return (block is not None and block <= _TAIL_BLOCK()
            and jax.default_backend() == "tpu")


def _generic_step(H: int, num_slots: int, products: tuple, degree: int,
                  block: int, variant: str, donate: bool,
                  axis_name: str | None = None, jit: bool = True):
    from ..utils.config import get_config

    mode = get_config().mxu_mode()
    pallas_on = _use_pallas_chain(block)
    if mode == "kernel" and not pallas_on:
        mode = "xla"  # in-kernel MXU needs the Pallas chain; keep MXU via XLA
    # "xla": MXU fold in the jnp body (XLA schedules matmul + carries);
    # "kernel": in-Pallas MXU fold (single HBM pass); "off": VPU CIOS
    return _generic_step_impl(H, num_slots, products, degree, block, variant,
                              donate, axis_name, jit,
                              pallas_on and mode != "xla",
                              mode == "xla", mode == "kernel")


# kept for the shard_map wrappers that reach the unjitted builder directly
_generic_step.__wrapped__ = (
    lambda *a, **k: _generic_step_impl(*a, **k, pallas=False)
)


@functools.lru_cache(maxsize=None)
def _generic_step_impl(H: int, num_slots: int, products: tuple, degree: int,
                       block: int, variant: str, donate: bool,
                       axis_name: str | None = None, jit: bool = True,
                       pallas: bool = False, mxu_fold: bool = False,
                       mxu_kernel: bool = False):
    """Build one round-program variant.

    fn(lo, hi, A2, r, h, t, buf, blen) ->
        (lo', hi', r', (h', t', buf', blen'), canon (16, d+1))

    lo/hi: (U, 16, H) uint32; A2: active pair count THIS round (u32, traced —
    the SAME compiled program serves every round that matches the variant);
    r: previous challenge digits (16,).

    `variant` is chosen statically per round by the driver (the round index
    is Python-side knowledge, so no traced branching is needed — traced
    `lax.cond` over these bodies sent XLA:CPU's compile memory past 15 GB):
      - "first_block": round 0 (no fold)
      - "fold_block":  fold+evaluate (every later round)
    Both bodies run a MASKED block loop with at least one block, so a single
    program per variant covers every active extent (A2 >= B uses exact
    blocks with an all-true mask; A2 < B uses one masked block whose fold
    partner sits at dynamic offset A2 inside the first 2B <= H lanes). A
    full prove therefore compiles exactly 2 table programs, reused across
    every nv in the family — vs ~2*nv programs for the per-size chain.
    """
    import jax
    import jax.numpy as jnp

    from . import engine

    # B <= H/2 keeps the sub-block fold partner slice [A2, A2+B) in bounds
    B = max(1, min(block, H // 2))
    # any power-of-two block is exact: `sum_lanes_wide` switches to its
    # two-level reduction above 2^16 lanes
    assert B & (B - 1) == 0
    U = num_slots
    d1 = degree + 1
    _u32 = jnp.uint32

    # ragged products are already padded with a ones slot by `_fold_plan`
    idx_np = np.array([list(ix) for ix in products], np.int32)

    # All table math is vectorized over (slots, t-points, lanes) so the trace
    # holds a handful of large CIOS multiplies, not U*P*(d+1) small ones —
    # per-slot Python loops made XLA:CPU compilation take minutes per variant.
    def fold_both(Lq, Hq, r_col3):
        """(U,16,B) slot-leading pair halves -> folded (16,U,B) digit-leading."""
        Ld = jnp.moveaxis(Lq, 0, 1)
        Hd = jnp.moveaxis(Hq, 0, 1)
        if mxu_fold:
            from ..ops.mxu_mul import mont_mul_scalar_mxu

            # the challenge is ONE shared scalar: the multiply runs on the
            # MXU as a banded-matrix product (bit-identical to CIOS)
            return LJ.add(Ld, mont_mul_scalar_mxu(LJ.sub(Hd, Ld), r_col3[:, 0, 0]))
        return LJ.add(Ld, LJ.mont_mul(LJ.sub(Hd, Ld), r_col3))

    def pair_sums(E, O, idx_mat):
        """E, O (16,U,B) digit-leading -> (WIDE, d+1) strict partials."""
        stacked = jnp.concatenate([E, O], axis=-1)  # (16,U,2B): even|odd
        return engine.round_sums(engine.DEVICE, stacked, None, idx_mat, degree)

    def lane_mask(off, A2):
        """(16,1,B) bool: global lane off+i active. All-true for full blocks;
        masks the one partial block of sub-block rounds."""
        lane = jax.lax.broadcasted_iota(_u32, (NUM_DIGITS, 1, B), 2)
        return (lane + off.astype(_u32)) < A2

    def first_block(lo, hi, A2, r_col, acc0, nb):
        idx_mat = jnp.asarray(idx_np)

        def body(b, carry):
            lo_, hi_, acc = carry
            off = b * B
            E = jax.lax.dynamic_slice(lo_, (0, 0, off), (U, NUM_DIGITS, B))
            O = jax.lax.dynamic_slice(hi_, (0, 0, off), (U, NUM_DIGITS, B))
            mask = lane_mask(off, A2)
            E = jnp.where(mask, jnp.moveaxis(E, 0, 1), 0)
            O = jnp.where(mask, jnp.moveaxis(O, 0, 1), 0)
            return lo_, hi_, acc + pair_sums(E, O, idx_mat)

        return jax.lax.fori_loop(0, nb, body, (lo, hi, acc0))

    def fold_block(lo, hi, A2, r_col, acc0, nb):
        idx_mat = jnp.asarray(idx_np)

        def body(b, carry):
            lo_, hi_, acc = carry
            off = b * B
            off2 = (A2.astype(jnp.int32) + b * B)
            L0 = jax.lax.dynamic_slice(lo_, (0, 0, off), (U, NUM_DIGITS, B))
            H0 = jax.lax.dynamic_slice(hi_, (0, 0, off), (U, NUM_DIGITS, B))
            L1 = jax.lax.dynamic_slice(lo_, (0, 0, off2), (U, NUM_DIGITS, B))
            H1 = jax.lax.dynamic_slice(hi_, (0, 0, off2), (U, NUM_DIGITS, B))
            mask = lane_mask(off, A2)
            nl = jnp.where(mask, fold_both(L0, H0, r_col), 0)  # (16,U,B)
            nh = jnp.where(mask, fold_both(L1, H1, r_col), 0)
            lo_ = jax.lax.dynamic_update_slice(
                lo_, jnp.moveaxis(nl, 0, 1), (0, 0, off)
            )
            hi_ = jax.lax.dynamic_update_slice(
                hi_, jnp.moveaxis(nh, 0, 1), (0, 0, off)
            )
            return lo_, hi_, acc + pair_sums(nl, nh, idx_mat)

        return jax.lax.fori_loop(0, nb, body, (lo, hi, acc0))

    if pallas:
        # Fused Pallas block body: the ~300 small HLOs of the jnp fold +
        # evaluate + reduce (each op-dispatch bound at these sizes — measured
        # ~1 ms per 8k-lane block, ~60x off HBM speed of light) collapse into
        # ONE kernel launch per block; outer structure (dynamic offsets,
        # masked extents, transcript) is unchanged and proofs stay
        # byte-identical (same integer partial sums).
        from ..ops.round_pallas import _build_chain, chain_block_sums_to_wide
        from ..utils.config import get_config

        interp = get_config().pallas_interpret  # off-TPU test path only
        bt = min(B, 1024)
        fold_call = _build_chain(B, U, products, degree, True, bt, interp,
                                 mxu=mxu_kernel)
        nofold_call = _build_chain(B, U, products, degree, False, bt, interp)

        def lane_mask2(off, A2):
            lane = jax.lax.broadcasted_iota(_u32, (NUM_DIGITS, B), 1)
            return ((lane + off.astype(_u32)) < A2).astype(_u32)

        def first_block_pl(lo, hi, A2, r_col, acc0, nb):
            def body(b, carry):
                lo_, hi_, acc = carry
                off = b * B
                E = jax.lax.dynamic_slice(lo_, (0, 0, off), (U, NUM_DIGITS, B))
                O = jax.lax.dynamic_slice(hi_, (0, 0, off), (U, NUM_DIGITS, B))
                (part,) = nofold_call(lane_mask2(off, A2), E, O)
                return lo_, hi_, acc + chain_block_sums_to_wide(part)

            return jax.lax.fori_loop(0, nb, body, (lo, hi, acc0))

        def fold_block_pl(lo, hi, A2, r_col, acc0, nb):
            if mxu_kernel:
                # challenge -> its (63, 32) bf16 band, once per round
                from ..ops.mxu_mul import scalar_band

                r_blk = scalar_band(r_col[:, 0, 0])
            else:
                r_blk = jnp.broadcast_to(r_col[:, 0], (NUM_DIGITS, bt))

            def body(b, carry):
                lo_, hi_, acc = carry
                off = b * B
                off2 = A2.astype(jnp.int32) + b * B
                L0 = jax.lax.dynamic_slice(lo_, (0, 0, off), (U, NUM_DIGITS, B))
                H0 = jax.lax.dynamic_slice(hi_, (0, 0, off), (U, NUM_DIGITS, B))
                L1 = jax.lax.dynamic_slice(lo_, (0, 0, off2), (U, NUM_DIGITS, B))
                H1 = jax.lax.dynamic_slice(hi_, (0, 0, off2), (U, NUM_DIGITS, B))
                flo, fhi, part = fold_call(
                    r_blk, lane_mask2(off, A2), L0, L1, H0, H1
                )
                lo_ = jax.lax.dynamic_update_slice(lo_, flo, (0, 0, off))
                hi_ = jax.lax.dynamic_update_slice(hi_, fhi, (0, 0, off))
                return lo_, hi_, acc + chain_block_sums_to_wide(part)

            return jax.lax.fori_loop(0, nb, body, (lo, hi, acc0))

        table_fn = {
            "first_block": first_block_pl,
            "fold_block": fold_block_pl,
        }[variant]
    else:
        table_fn = {
            "first_block": first_block,
            "fold_block": fold_block,
        }[variant]

    def fn(lo, hi, A2, r, h, t, buf, blen):
        r_col = r[:, None, None]  # broadcasts over (16, U, B)
        acc0 = jnp.zeros((LJ.WIDE_DIGITS, d1), _u32)
        # at least one (masked) block even when the extent is sub-block
        nb = jnp.maximum((A2 // _u32(B)).astype(jnp.int32), 1)
        lo, hi, acc = table_fn(lo, hi, A2, r_col, acc0, nb)
        if axis_name is not None:
            # exact integer allreduce of the strict-wide partials (< 2^25
            # per digit, so a psum over any real shard count stays in u32);
            # every shard then advances an identical transcript replica
            acc = jax.lax.psum(acc, axis_name)

        # normalize the relaxed accumulator (digits < 2^16 * nblocks), then
        # Fiat-Shamir: reduce mod p, to-canonical, feed Vec<Fr>, sample.
        strict_rows, _ = LJ._chain([acc[i] for i in range(LJ.WIDE_DIGITS)])
        sums = jnp.stack(strict_rows)
        mont = LJ.reduce_wide(sums)
        canon = LJ.mont_mul_const(mont, _ONE_DIGITS)
        state = feed_fr_vec_dyn((h, t, buf, blen), canon)
        r_new, state = fr_rand_dyn(state)
        return lo, hi, r_new, state, canon

    if not jit:
        return fn
    dn = (0, 1) if donate else ()
    return jax.jit(fn, donate_argnums=dn)


_R_CAP = 32  # static message-buffer depth of a chain program (rounds <= 30)


def _TAIL_BLOCK() -> int:
    """Narrow-chain block (config knob SUMCHECK_TPU_TAIL_BLOCK, default 2^9)
    for rounds whose extent has fallen below the wide block."""
    from ..utils.config import get_config

    return get_config().tail_block


def _chain_step(H: int, num_slots: int, products: tuple, degree: int,
                block: int, donate: bool,
                axis_name: str | None = None, jit: bool = True):
    from ..utils.config import get_config

    mode = get_config().mxu_mode()
    pallas_on = _use_pallas_chain(block)
    if mode == "kernel" and not pallas_on:
        mode = "xla"  # in-kernel MXU needs the Pallas chain; keep MXU via XLA
    return _chain_step_impl(H, num_slots, products, degree, block, donate,
                            axis_name, jit,
                            pallas_on and mode != "xla",
                            mode == "xla", mode == "kernel")


_chain_step.__wrapped__ = (
    lambda *a, **k: _chain_step_impl(*a, **k, pallas=False)
)


@functools.lru_cache(maxsize=None)
def _chain_step_impl(H: int, num_slots: int, products: tuple, degree: int,
                     block: int, donate: bool,
                     axis_name: str | None = None, jit: bool = True,
                     pallas: bool = False, mxu_fold: bool = False,
                     mxu_kernel: bool = False):
    """Multi-round chain program: run a DYNAMIC number of consecutive fold
    rounds inside one compiled program (the masked `fold_block` body covers
    block-sized and sub-block extents alike).

    Per-round dispatch costs ~2 ms on a tunneled TPU; nv=20 needs 20 rounds
    and GKR nv=18 needs 36 — at one dispatch per round that overhead alone
    exceeds a 15x-baseline GKR budget. The chain collapses every round after
    the first into ONE dispatch (outer `fori_loop` over rounds, inner over
    blocks); a full prove is 2 dispatches + 1 fetch, and a full cold start
    compiles 2 table programs.

    fn(lo, hi, A2_start, n_rounds, r, h, t, buf, blen) ->
        (lo', hi', r', state', msgs (R_CAP,16,d+1), rs (R_CAP,16))
    Round j in [0, n_rounds) has active pairs A2_start >> j; its canonical
    message lands in msgs[j], its sampled challenge in rs[j].
    """
    import jax
    import jax.numpy as jnp

    inner = _generic_step_impl(
        H, num_slots, products, degree, block, "fold_block",
        False, axis_name=axis_name, jit=False, pallas=pallas,
        mxu_fold=mxu_fold, mxu_kernel=mxu_kernel,
    )
    d1 = degree + 1
    _u32 = jnp.uint32

    def fn(lo, hi, A2_start, n_rounds, r, h, t, buf, blen):
        msgs = jnp.zeros((_R_CAP, NUM_DIGITS, d1), _u32)
        rs = jnp.zeros((_R_CAP, NUM_DIGITS), _u32)

        def round_body(j, carry):
            lo, hi, r, h, t, buf, blen, msgs, rs = carry
            a2 = jnp.right_shift(A2_start, j.astype(_u32))
            lo, hi, r, (h, t, buf, blen), canon = inner(
                lo, hi, a2, r, h, t, buf, blen
            )
            msgs = jax.lax.dynamic_update_slice(msgs, canon[None], (j, 0, 0))
            rs = jax.lax.dynamic_update_slice(rs, r[None], (j, 0))
            return lo, hi, r, h, t, buf, blen, msgs, rs

        lo, hi, r, h, t, buf, blen, msgs, rs = jax.lax.fori_loop(
            0, n_rounds, round_body,
            (lo, hi, r, h, t, buf, blen, msgs, rs),
        )
        return lo, hi, r, (h, t, buf, blen), msgs, rs

    if not jit:
        return fn
    dn = (0, 1) if donate else ()
    return jax.jit(fn, donate_argnums=dn)


_warmed_families: set = set()


def _warm_family(H: int, num_slots: int, products: tuple, degree: int,
                 B: int, donate: bool, H0: int, num_rounds: int) -> None:
    """Compile this family's round programs CONCURRENTLY.

    Through the tunneled-TPU backend each program costs ~20-25 s to compile
    serially; the compile service runs server-side, so three Python threads
    overlap the compiles and the cold wall drops to ~max instead of ~sum.
    Each thread executes one dummy round on zero buffers (compile + one cheap
    run); results are discarded, the jitted executables stay cached.

    Big tables compile AOT instead: three concurrent zero (lo, hi) sets cost
    `3 * 2 * U * 16 * H * 4` bytes of HBM — 19.2 GB at the nv=24 family,
    which OOMed a 16 GB chip before any real work ran. Above ~2 GB per set
    the warm lowers onto `jax.ShapeDtypeStruct`s and calls `.compile()`
    (server-side compile, zero device allocation); the first real call then
    re-resolves through the persistent compilation cache the AOT compile
    just populated."""
    import concurrent.futures

    import jax
    import jax.numpy as jnp

    programs = ["first_block"]
    if num_rounds > 1:
        programs.append("fold_chain")
        if min(B, _TAIL_BLOCK()) != B:
            programs.append("fold_chain_tail")

    set_bytes = 2 * num_slots * NUM_DIGITS * H * 4
    aot = set_bytes > (2 << 30)

    def compile_one(name):
        mk = (
            (lambda s, d: jax.ShapeDtypeStruct(s, d)) if aot
            else (lambda s, d: jnp.zeros(s, d))
        )
        lo = mk((num_slots, NUM_DIGITS, H), jnp.uint32)
        hi = mk((num_slots, NUM_DIGITS, H), jnp.uint32)
        r = mk((NUM_DIGITS,), jnp.uint32)
        h = mk((8, 2), jnp.uint32)
        buf = mk((16, 2), jnp.uint32)
        if aot:
            u32 = lambda _v: jax.ShapeDtypeStruct((), jnp.uint32)  # noqa: E731
            i32 = lambda _v: jax.ShapeDtypeStruct((), jnp.int32)  # noqa: E731
        else:
            u32, i32 = jnp.uint32, jnp.int32
        if name.startswith("fold_chain"):
            Bc = min(B, _TAIL_BLOCK()) if name.endswith("tail") else B
            cstep = _chain_step(H, num_slots, products, degree, Bc, donate)
            args = (lo, hi, u32(Bc), i32(1), r, h, u32(0), buf, u32(0))
            fn = cstep
        else:
            step = _generic_step(H, num_slots, products, degree, B, name, donate)
            args = (lo, hi, u32(H0), r, h, u32(0), buf, u32(0))
            fn = step
        if aot:
            fn.lower(*args).compile()
        else:
            fn(*args)[2].block_until_ready()

    with concurrent.futures.ThreadPoolExecutor(len(programs)) as ex:
        list(ex.map(compile_one, programs))


_warm_futures: dict = {}


def prewarm_family_async(H: int, num_slots: int, products: tuple, degree: int,
                         B: int, donate: bool, H0: int,
                         num_rounds: int) -> None:
    """Launch this family's program compiles on BACKGROUND threads without
    blocking, so the caller's table upload/init overlaps the server-side
    compilation (cold-start wall, VERDICT round-4 ask #4). The join happens
    in `chain_rounds_generic` right before the first dispatch; jit-level
    compile locking makes a duplicate call at worst a duplicated wait."""
    import concurrent.futures

    import jax

    if jax.default_backend() != "tpu":
        return
    key = (H, num_slots, products, degree, B, donate, H0, num_rounds)
    if key in _warmed_families or key in _warm_futures:
        return
    ex = concurrent.futures.ThreadPoolExecutor(1)
    _warm_futures[key] = [
        ex.submit(_warm_family, H, num_slots, products, degree, B, donate,
                  H0, num_rounds)
    ]
    ex.shutdown(wait=False)


def _join_warm(key) -> None:
    futs = _warm_futures.pop(key, None)
    if futs is not None:
        for f in futs:
            f.result()
    else:
        _warm_family(*key)
    _warmed_families.add(key)


def pad_pair(lo, hi):
    """Zero-pad the pair buffers up to the configured lane family so every
    instance size shares the SAME compiled round programs (work scales with
    the traced active extent, not the buffer shape — a padded nv=14 prove
    does nv=14 work inside an nv=20-family program)."""
    import jax.numpy as jnp

    from ..utils.config import get_config

    target = get_config().generic_pad_lanes()
    H = lo.shape[2]
    if target and H < target:
        pad = ((0, 0), (0, 0), (0, target - H))
        lo, hi = jnp.pad(lo, pad), jnp.pad(hi, pad)
    return lo, hi


def chain_rounds_generic(lo, hi, state, products: tuple, degree: int,
                         num_rounds: int, block: int | None = None,
                         donate: bool = True, active_pairs: int | None = None):
    """Enqueue `num_rounds` rounds through the shape-generic programs: one
    `first_*` dispatch for round 0, ONE `fold_block_chain` dispatch for every
    block round, ONE `fold_tail_chain` dispatch for the tail — 3 dispatches
    per prove (programs reused across callers with the same (H, slots,
    products, degree), e.g. both GKR phases and every padded instance size).

    `state` is the dynamic transcript tuple (h, t, buf, blen);
    `active_pairs` is the true round-0 pair count (defaults to the buffer
    width — pass it when the buffers are padded). Returns
    (parts, state, (lo, hi), r_final) where `parts` is a list of
    (msgs (k,16,d+1) device, rs (k,16) device, n_valid) in round order."""
    import jax
    import jax.numpy as jnp

    from ..utils.config import get_config

    H = lo.shape[2]
    U = lo.shape[0]
    H0 = active_pairs if active_pairs is not None else H
    B = min(block if block is not None else get_config().generic_block, H)
    assert num_rounds <= _R_CAP

    key = (H, U, products, degree, B, donate, H0, num_rounds)
    if jax.default_backend() == "tpu" and key not in _warmed_families:
        _join_warm(key)  # blocks here only if a prewarm isn't already done

    # Huge tables serialize the 3 chain dispatches: the TPU runtime reserves
    # execution resources at ENQUEUE time, and queueing all stages of an
    # nv=24 prove (2 x 3.2 GB donated pair buffers flowing through 3
    # programs) exhausted the device even though the executed live set fits
    # — block_until_ready between stages bounds the reservation to one
    # in-flight program. Two extra ~25 ms tunnel round-trips per prove,
    # engaged only above 2 GB per buffer set where prove wall is seconds.
    big_sync = 2 * U * NUM_DIGITS * H * 4 > (2 << 30)

    r = jnp.zeros((NUM_DIGITS,), jnp.uint32)
    parts = []

    step = _generic_step(H, U, products, degree, B, "first_block", donate)
    lo, hi, r, state, canon = step(lo, hi, jnp.uint32(H0), r, *state)
    parts.append((canon[None], r[None], 1))
    if big_sync:
        jax.block_until_ready(lo)

    # Tail rounds with A2 < B still pay one FULL masked B-block of Montgomery
    # ALU (the mask zeroes results, not work), ~2.5 ms/round at B=2^13 — the
    # dominant cost of every small-dim prove (GKR dim rounds especially). So
    # the chain is split: rounds whose extent fills at least one B-block run
    # in the big-B chain; the rest run in a narrow-B chain whose masked slab
    # is ~B/B_TAIL x cheaper. One extra compiled program per family.
    B_tail = min(B, _TAIL_BLOCK())
    n_rest = num_rounds - 1
    if n_rest > 0:
        # rounds j = 1 .. with extent H0 >> j; big rounds need H0 >> j >= B
        n_big = max(0, min(n_rest, (H0 // B).bit_length() - 1))
        if B_tail == B:
            n_big = n_rest
        if n_big > 0:
            cstep = _chain_step(H, U, products, degree, B, donate)
            lo, hi, r, state, msgs, rs = cstep(
                lo, hi, jnp.uint32(H0 >> 1), jnp.int32(n_big), r, *state
            )
            parts.append((msgs, rs, n_big))
            if big_sync:
                jax.block_until_ready(lo)
        if n_rest - n_big > 0:
            cstep = _chain_step(H, U, products, degree, B_tail, donate)
            lo, hi, r, state, msgs, rs = cstep(
                lo, hi, jnp.uint32(H0 >> (n_big + 1)),
                jnp.int32(n_rest - n_big), r, *state
            )
            parts.append((msgs, rs, n_rest - n_big))
            if big_sync:
                jax.block_until_ready(lo)
    return parts, state, (lo, hi), r


@functools.lru_cache(maxsize=None)
def _copier():
    import jax

    return jax.jit(lambda a: a + 0)


_parts_packer = None


def _pack_parts(parts, state):
    """All chain outputs -> ONE flat uint32 array (single device fetch).
    jit caches per pytree structure/shapes, so each parts layout compiles a
    tiny concat program once."""
    global _parts_packer
    import jax
    import jax.numpy as jnp

    if _parts_packer is None:
        def pack(arrs, st):
            h, t, buf, blen = st
            flats = [a.reshape(-1) for a in arrs]
            flats += [h.reshape(-1), t.reshape(1), buf.reshape(-1),
                      blen.reshape(1)]
            return jnp.concatenate(flats)

        _parts_packer = jax.jit(pack)
    arrs = []
    for msgs, rs, _n in parts:
        arrs.append(msgs)
        arrs.append(rs)
    return _parts_packer(tuple(arrs), state)


def _fetch(parts, state, degree: int):
    """One host transfer; trims each part's buffer to its valid rows.
    Returns (msgs (k,16,d+1), rs (k,16), (h,t,buf), blen)."""
    flat = np.asarray(_pack_parts(parts, state))
    d1 = degree + 1
    msgs_list, rs_list = [], []
    off = 0
    for msgs, rs, n in parts:
        rows = msgs.shape[0]
        sz = rows * NUM_DIGITS * d1
        msgs_list.append(flat[off : off + sz].reshape(rows, NUM_DIGITS, d1)[:n])
        off += sz
        sz = rows * NUM_DIGITS
        rs_list.append(flat[off : off + sz].reshape(rows, NUM_DIGITS)[:n])
        off += sz
    h = flat[off : off + 16].reshape(8, 2)
    t = flat[off + 16]
    buf = flat[off + 17 : off + 49].reshape(16, 2)
    blen = int(flat[off + 49])
    return np.concatenate(msgs_list), np.concatenate(rs_list), (h, t, buf), blen


def prove_generic(fs_rng, polynomial, block: int | None = None):
    """Full Fiat-Shamir prove through the shape-generic chained step; returns
    (prover_msgs, ProverState) exactly like the host path / per-size chain."""
    import jax.numpy as jnp

    from ..utils.config import get_config
    from .prover import ProverState

    nv = polynomial.num_variables
    # Kick the family's program compiles off BEFORE the table upload/init so
    # the two overlap (the compiles run server-side): on a wiped compile
    # cache the upload + pair init hides under the ~60 s compile wall
    # instead of adding to it.
    from .device_prover import _fold_plan

    products_w, _sp, num_slots_w, _no = _fold_plan(polynomial)
    cfg = get_config()
    H0_w = 1 << (nv - 1) if nv >= 1 else 1
    target = cfg.generic_pad_lanes()
    H_w = target if (target and H0_w < target) else H0_w
    B_w = min(block if block is not None else cfg.generic_block, H_w)
    prewarm_family_async(H_w, num_slots_w, products_w,
                         polynomial.max_multiplicands, B_w, True, H0_w, nv)

    lo, hi, products, degree, reusable = init_pair(polynomial)
    if reusable:
        # the pair is a polynomial-level cache; the chain folds in place, so
        # work on a device-side copy (HBM->HBM, ~10 ms/GB vs ~1 s/GB re-upload)
        cp = _copier()
        lo, hi = cp(lo), cp(hi)
        if lo.size * 8 > (2 << 30):  # huge pair: see big_sync in chain_rounds
            import jax

            jax.block_until_ready(lo)

    ts = lift_transcript(fs_rng)
    state = (ts.h, ts.t, ts.buf, jnp.uint32(ts.blen))

    H0 = lo.shape[2]
    lo, hi = pad_pair(lo, hi)
    parts, state, (lo, hi), _r = chain_rounds_generic(
        lo, hi, state, products, degree, nv, block=block, active_pairs=H0
    )

    msgs_h, rs_h, carry_h, blen = _fetch(parts, state, degree)

    prover_msgs = msgs_from_host(msgs_h, degree)
    randomness = [Fr(col_int(rd) * R_INV % P) for rd in rs_h]
    restore_transcript(fs_rng, carry_h, blen)

    prover_state = ProverState(
        randomness=randomness,
        list_of_products=[(c, list(ix)) for c, ix in polynomial.products],
        stacked=(lo, hi),
        num_vars=nv,
        max_multiplicands=degree,
    )
    prover_state.round = nv
    return prover_msgs, prover_state
