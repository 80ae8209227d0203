"""Chained on-device Fiat-Shamir prover — the fast path for
`MLSumcheck.prove` / `prove_as_subprotocol` (reference flow
`src/ml_sumcheck/mod.rs:50-70`, hot loops `protocol/prover.rs:74-153`).

The host transcript state is lifted onto the device once; every round —
fold, round-polynomial evaluation, lane reduction, transcript feed, challenge
sampling (`transcript/device.py`) — then runs as one jitted step whose output
feeds the next step's input, so the host enqueues all `nv` rounds
*asynchronously* and synchronizes exactly once at the end to fetch the proof,
the challenges, and the final transcript state. On a tunneled TPU a
host-side transcript costs a ~35 ms device→host→device sync per round; this
path costs one.

Bit-exactness: the byte schedule (feed `Vec<Fr>` per round, 4x`next_u64`
rejection sampling per challenge) is identical to the host path, so proofs
are byte-identical whichever engine runs (`tests/test_device_prover.py`).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..fields import limbs_jnp as LJ
from ..fields import limbs_np as L
from ..fields.fr import Fr, NUM_DIGITS, P, R_INV
from ..transcript.device import (
    DevTranscript,
    blen_after_feed,
    feed_fr_vec,
    fr_rand,
)
from . import engine

_ONE_DIGITS = (1,) + (0,) * (NUM_DIGITS - 1)


@functools.lru_cache(maxsize=None)
def _kernel_step(
    half: int,
    num_slots: int,
    products: tuple,
    degree: int,
    do_fold: bool,
    use_pallas: bool,
    block: int,
    interpret: bool,
    donate: bool = True,
):
    """The per-round table work: [fold by r] -> evaluate at t=0..d ->
    lane-reduce. Keyed ONLY by shape/structure (no transcript state), so a
    compiled kernel for table half `h` is reused by every nv that passes
    through `h` — the compile cache amortizes across the whole size sweep.

    fn(lo, hi, r_digits) -> ((new_lo, new_hi), wide_sums (WIDE, d+1)).
    Coefficients do not appear: they are folded into the tables at init
    (`init_pair`), saving one Montgomery multiply per product per point.
    """
    import jax
    import jax.numpy as jnp

    idx_np = np.array([list(ix) for ix in products], np.int32)

    def fn(lo, hi, r_digits):
        if use_pallas:
            from ..ops.round_pallas import round_pallas

            pair, sums = round_pallas(
                lo, hi, r_digits, None, products, degree, do_fold,
                block=block, interpret=interpret,
            )
        else:
            # slot axis leading: digit-axis ops happen per slot slice
            stacked = jnp.concatenate([lo, hi], axis=2)  # (U, 16, m)
            if do_fold:
                stacked = jnp.stack(
                    [
                        engine.fold_tables(
                            engine.DEVICE, stacked[u], r_digits[:, None]
                        )
                        for u in range(num_slots)
                    ]
                )
            m2 = stacked.shape[2] // 2
            if m2 <= (1 << 14):  # int32 block reduction stays exact
                from ..ops.round_pallas import _block_sums

                E = [stacked[u, :, :m2] for u in range(num_slots)]
                O = [stacked[u, :, m2:] for u in range(num_slots)]
                part = _block_sums(E, O, None, products, degree)  # (d+1, 16)
                rows = jnp.moveaxis(part, 1, 0)  # (16, d+1) relaxed
                pad = [jnp.zeros_like(rows[0])] * (LJ.WIDE_DIGITS - NUM_DIGITS)
                strict, _ = LJ._chain([rows[i] for i in range(NUM_DIGITS)] + pad)
                sums = jnp.stack(strict)  # (WIDE, d+1) — already lane-reduced
            else:
                sums = engine.round_sums(
                    engine.DEVICE, jnp.moveaxis(stacked, 0, 1), None,
                    jnp.asarray(idx_np), degree,
                )
            if do_fold:
                pair = (stacked[:, :, :m2], stacked[:, :, m2:])
            else:
                pair = None
        # a no-fold round returns None for the pair: passing (lo, hi) through
        # jit would materialize a full un-donated COPY of the tables (6.4 GB
        # at nv=24) — the caller keeps using its existing handles instead
        return pair, sums

    # Donating pays only when XLA can alias in-place: the big fold rounds.
    # Small tail rounds (< 256 lanes) can't alias (layout-padded) and warn
    # "donated buffers were not usable" while silently copying — skip them.
    dn = (0, 1) if (do_fold and donate and half >= 512) else ()
    return jax.jit(fn, donate_argnums=dn)


@functools.lru_cache(maxsize=None)
def _transcript_step(blen_in: int, degree: int):
    """The per-round Fiat-Shamir work: reduce the wide sums mod p, convert to
    canonical residues, feed `Vec<Fr>`, sample the next challenge. Keyed only
    by the (cyclic, ~16-valued) pending-byte count and the degree — a handful
    of programs serve every round of every instance size.

    Returns (jitted fn, blen_out); fn(carry, sums) -> (carry', canon, r')."""
    import jax

    blen_out = blen_after_feed(blen_in, 8 + 32 * (degree + 1))

    def fn(carry, sums):
        ts = DevTranscript.from_carry(carry, blen_in)
        mont = LJ.reduce_wide(sums)  # (16, d+1) Montgomery-form evals
        canon = LJ.mont_mul_const(mont, _ONE_DIGITS)  # *R^-1: canonical
        ts = feed_fr_vec(ts, canon)
        r_new, ts = fr_rand(ts)
        return ts.carry(), canon, r_new

    return jax.jit(fn), blen_out


def _fold_plan(polynomial):
    """Decide how to fold each product's coefficient into a table slot.

    Returns (products, scale_plan, num_slots, need_ones):
    - products: padded index tuples with coefficients absorbed;
    - scale_plan: list of (dst_slot, src_slot, coeff_int) — dst == src means
      scale in place (slot referenced nowhere else); dst >= num_tables
      appends a scaled copy (slot shared between products);
    - coefficient 1 folds for free (no scale op).
    """
    num_tables = len(polynomial.flattened_ml_extensions)
    usage = [0] * num_tables
    prods = [list(ix) for _, ix in polynomial.products]
    for ix in prods:
        for s in ix:
            usage[s] += 1
    scale_plan = []
    next_slot = num_tables
    for (coeff, _), ix in zip(polynomial.products, prods):
        if coeff.v == 1:
            continue
        t0 = ix[0]
        if usage[t0] == 1:
            scale_plan.append((t0, t0, coeff.v))
        else:
            scale_plan.append((next_slot, t0, coeff.v))
            usage[t0] -= 1
            ix[0] = next_slot
            next_slot += 1
    max_len = max(len(ix) for ix in prods)
    need_ones = any(len(ix) < max_len for ix in prods)
    ones_slot = next_slot
    products = tuple(
        tuple(ix + [ones_slot] * (max_len - len(ix))) for ix in prods
    )
    num_slots = next_slot + (1 if need_ones else 0)
    return products, tuple(scale_plan), num_slots, need_ones


@functools.lru_cache(maxsize=None)
def _stacker(plan_key: tuple, need_ones: bool, n: int, num_tabs: int):
    """Jitted stack+scale+split for one (plan, size) shape family."""
    import jax
    import jax.numpy as jnp

    def stack(ts, cols):
        ts = list(ts)
        for (dst, src), col in zip(plan_key, cols):
            scaled = LJ.mont_mul(ts[src], col)
            if dst == src:
                ts[src] = scaled
            else:
                ts.append(scaled)
        if need_ones:
            ts.append(
                jnp.broadcast_to(jnp.asarray(L.mont_scalar(1)), (NUM_DIGITS, n))
            )
        # slot axis LEADING: (U, 16, n) tiles as (16 sublanes, n lanes) with
        # zero padding; (16, U, n) would pad U up to 8 sublanes (1.33x HBM)
        s = jnp.stack(ts, axis=0)
        return s[:, :, : n // 2], s[:, :, n // 2 :]

    return jax.jit(stack)


# above this many table bytes, the pair is built incrementally (peak HBM =
# pair + ONE packed table) and NOT cached on the polynomial: the per-MLE
# device copies are dropped, and each prove re-initializes the pair and
# donates it into the round chain. Round-5 bisection on the v5e: the chain's
# while-loop carry needs a ping-pong temp of pair size, so cached pair +
# working copy + temp = 3x pair bytes = 19.2 GB at nv=24 — the prove
# executes only when at most TWO pair-sized allocations are live. Re-init
# per prove (device-side generation or re-upload) is the price of fitting.
_BIG_PAIR_BYTES = int(os.environ.get("SUMCHECK_TPU_BIG_PAIR_BYTES", 2 << 30))


@functools.lru_cache(maxsize=None)
def _slot_writer(num_slots: int, n: int, do_scale: bool):
    """Unpack one packed (8, n) table upload, optionally Montgomery-scale it,
    and write its halves into slot `u` of the donated (lo, hi) pair —
    incremental init keeps peak HBM at pair + ONE table instead of pair +
    all tables (nv=24's 6-table workload OOMs a 16 GB chip otherwise)."""
    import jax
    import jax.numpy as jnp

    half = n // 2

    def fn(lo, hi, packed, coeff_col, u):
        p_lo = packed & jnp.uint32(0xFFFF)
        p_hi = packed >> 16
        tbl = jnp.stack([p_lo, p_hi], axis=1).reshape(NUM_DIGITS, n)
        if do_scale:
            tbl = LJ.mont_mul(tbl, coeff_col)
        lo = jax.lax.dynamic_update_slice(lo, tbl[None, :, :half], (u, 0, 0))
        hi = jax.lax.dynamic_update_slice(hi, tbl[None, :, half:], (u, 0, 0))
        return lo, hi

    return jax.jit(fn, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=None)
def _ones_writer(n: int):
    import jax
    import jax.numpy as jnp

    half = n // 2

    def fn(lo, hi, u):
        ones = jnp.broadcast_to(
            jnp.asarray(L.mont_scalar(1)), (1, NUM_DIGITS, half)
        )
        lo = jax.lax.dynamic_update_slice(lo, ones, (u, 0, 0))
        hi = jax.lax.dynamic_update_slice(hi, ones, (u, 0, 0))
        return lo, hi

    return jax.jit(fn, donate_argnums=(0, 1))


def _init_pair_incremental(polynomial, plan_key, scale_plan, num_slots,
                           need_ones, n):
    """Big-table init: one packed upload + unpack + slot write per table."""
    import jax.numpy as jnp

    mles = polynomial.flattened_ml_extensions
    lo = jnp.zeros((num_slots, NUM_DIGITS, n // 2), jnp.uint32)
    hi = jnp.zeros((num_slots, NUM_DIGITS, n // 2), jnp.uint32)
    inplace = {src: c for dst, src, c in scale_plan if dst == src}
    copies = [(dst, src, c) for dst, src, c in scale_plan if dst != src]
    one_col = jnp.asarray(L.mont_scalar(1))
    for u, m in enumerate(mles):
        packed = jnp.asarray(m.host_packed_bitrev())
        if u in inplace:
            col = jnp.asarray(L.mont_scalar(inplace[u]))
            lo, hi = _slot_writer(num_slots, n, True)(lo, hi, packed, col, u)
        else:
            lo, hi = _slot_writer(num_slots, n, False)(lo, hi, packed, one_col, u)
        for dst, src, c in copies:
            if src == u:
                col = jnp.asarray(L.mont_scalar(c))
                lo, hi = _slot_writer(num_slots, n, True)(lo, hi, packed, col, dst)
    if need_ones:
        lo, hi = _ones_writer(n)(lo, hi, num_slots - 1)
    # One sync before returning: TPU execution allocates output buffers at
    # ENQUEUE time and frees inputs only when execution completes, so the
    # fully-async pipeline (per-table uploads/generators + slot writers +
    # the caller's pair copy + the round chain) holds every packed table
    # alive at once — at nv=24 that transient pushed the live set past HBM
    # and the prove died RESOURCE_EXHAUSTED at the final fetch. Waiting here
    # retires the per-table buffers before the prover enqueues; this is the
    # once-per-polynomial setup path, so the ~25 ms tunnel round-trip is
    # noise.
    import jax

    jax.block_until_ready(lo)
    return lo, hi


def init_pair(polynomial):
    """Build the (lo, hi) table pair the round kernels consume: unique tables
    (device-cached, bit-reversed — `DenseMLE.device_bitrev`), product
    coefficients pre-multiplied into one exclusive slot each, a constant-one
    slot only if some product needs ragged padding.

    Returns (lo, hi, products, degree, reusable) — `reusable` means the pair
    is a polynomial-level cache the chain must not donate on first fold."""
    import jax.numpy as jnp

    nv = polynomial.num_variables
    n = 1 << nv
    products, scale_plan, num_slots, need_ones = _fold_plan(polynomial)
    plan_key = tuple((d, s) for d, s, _ in scale_plan)

    cache = getattr(polynomial, "_dev_pair", None)
    if cache is not None and cache[0] == plan_key:
        lo, hi = cache[1]
        return lo, hi, products, polynomial.max_multiplicands, True

    mles = polynomial.flattened_ml_extensions
    big = num_slots * n * NUM_DIGITS * 4 >= _BIG_PAIR_BYTES
    if big:
        lo, hi = _init_pair_incremental(
            polynomial, plan_key, scale_plan, num_slots, need_ones, n
        )
        for m in mles:  # per-MLE device copies would waste HBM at this scale
            m._dev_bitrev = None
        # reusable=False: the chain donates this pair (see _BIG_PAIR_BYTES —
        # holding a cached pair AND a working copy AND the chain's ping-pong
        # temp is 3x pair bytes and OOMs nv=24)
        return lo, hi, products, polynomial.max_multiplicands, False

    tabs = tuple(m.device_bitrev() for m in mles)
    coeff_cols = tuple(jnp.asarray(L.mont_scalar(c)) for _, _, c in scale_plan)
    lo, hi = _stacker(plan_key, need_ones, n, len(tabs))(tabs, coeff_cols)
    return lo, hi, products, polynomial.max_multiplicands, False


def chain_rounds(lo, hi, carry, blen, products, degree, num_rounds,
                 keep_input_pair: bool = False):
    """Enqueue `num_rounds` rounds (no host sync): per round one kernel
    dispatch + one transcript dispatch, output feeding input. Returns
    (msgs_dev, rs_dev, carry, blen, (lo, hi)) — all device handles; `rs_dev`
    holds the sampled challenge digits (Montgomery form) per round.
    `keep_input_pair` disables donation on the first fold (the input pair is
    a polynomial-level cache reused by later proves)."""
    import jax.numpy as jnp

    from ..utils.config import get_config

    cfg = get_config()
    num_slots = lo.shape[0]  # slot axis leads: (U, 16, half)
    msgs_dev, rs_dev = [], []
    r = jnp.zeros((NUM_DIGITS,), jnp.uint32)
    for i in range(num_rounds):
        half = lo.shape[2]
        use_pallas = cfg.use_pallas(2 * half) and not cfg.pallas_interpret
        kfn = _kernel_step(
            half, num_slots, products, degree,
            do_fold=(i > 0),
            use_pallas=use_pallas,
            block=min(cfg.pallas_block, max(half // 2, 1)),
            interpret=cfg.pallas_interpret,
            donate=not (keep_input_pair and i == 1),
        )
        tfn, blen = _transcript_step(blen, degree)
        pair, sums = kfn(lo, hi, r)
        if pair is not None:
            lo, hi = pair
        carry, canon, r = tfn(carry, sums)
        msgs_dev.append(canon)
        rs_dev.append(r)
    return msgs_dev, rs_dev, carry, blen, (lo, hi)


@functools.lru_cache(maxsize=None)
def _packer(num_msgs: int, degree: int):
    """Concatenate all chain outputs into ONE flat uint32 device array so the
    final host fetch is a single transfer (on a tunneled TPU every array in a
    `device_get` pytree pays full round-trip latency — 30+ tiny leaves turned
    a ~40 ms sync into ~100 ms)."""
    import jax
    import jax.numpy as jnp

    def pack(msgs, rs, carry):
        parts = [jnp.stack(msgs).reshape(-1), jnp.stack(rs).reshape(-1),
                 carry[0].reshape(-1), carry[1].reshape(1), carry[2].reshape(-1)]
        return jnp.concatenate(parts)

    return jax.jit(pack)


def fetch_chain_outputs(msgs_dev, rs_dev, carry, degree: int):
    """One-transfer fetch; returns (msgs (k,16,d+1), rs (k,16), carry) as
    NumPy values."""
    k = len(msgs_dev)
    flat = np.asarray(_packer(k, degree)(msgs_dev, rs_dev, carry))
    d1 = degree + 1
    o1 = k * NUM_DIGITS * d1
    o2 = o1 + k * NUM_DIGITS
    msgs = flat[:o1].reshape(k, NUM_DIGITS, d1)
    rs = flat[o1:o2].reshape(k, NUM_DIGITS)
    h = flat[o2 : o2 + 16].reshape(8, 2)
    t = flat[o2 + 16]
    buf = flat[o2 + 17 : o2 + 49].reshape(16, 2)
    return msgs, rs, (h, t, buf)


@functools.lru_cache(maxsize=None)
def _lift_cached(state_key):
    """Upload a host transcript state as ONE packed transfer (cached — the
    fresh-transcript-plus-info prefix repeats across proves)."""
    import jax
    import jax.numpy as jnp

    h, t, buf = state_key[0], state_key[1], state_key[2]
    hw = np.array([(w & 0xFFFFFFFF, w >> 32) for w in h], np.uint64).astype(np.uint32)
    words = [int.from_bytes(buf[8 * i : 8 * i + 8], "little") for i in range(len(buf) // 8)]
    words += [0] * (16 - len(words))
    bw = np.array([(w & 0xFFFFFFFF, w >> 32) for w in words], np.uint64).astype(np.uint32)
    flat = np.concatenate([hw.reshape(-1), np.array([t], np.uint32), bw.reshape(-1)])

    @jax.jit
    def unpack(f):
        return f[:16].reshape(8, 2), f[16], f[17:49].reshape(16, 2)

    return unpack(jnp.asarray(flat))


def lift_transcript(fs_rng) -> DevTranscript:
    """Device transcript from a host `Blake2b512Rng`, one cached upload."""
    h, t, buf = fs_rng.state_tuple()
    carry = _lift_cached((tuple(h), t, buf))
    return DevTranscript(carry[0], carry[1], carry[2], len(buf))


def col_int(d) -> int:
    """(16,) strict digit column (host) -> Python int."""
    v = 0
    for k in range(NUM_DIGITS):
        v |= int(d[k]) << (16 * k)
    return v


def msgs_from_host(msgs_h, degree: int):
    """Fetched canonical digit mats [(16, d+1)] -> list[ProverMsg]."""
    from .prover import ProverMsg

    return [
        ProverMsg([Fr(col_int(m[:, t])) for t in range(degree + 1)])
        for m in msgs_h
    ]


def restore_transcript(fs_rng, carry_h, blen: int) -> None:
    """Write the fetched device transcript state back into the host rng."""
    final = DevTranscript(carry_h[0], carry_h[1], carry_h[2], blen)
    h, t, buf = final.lower()
    fs_rng.set_state(h, t, buf)


def prove_chained(fs_rng, polynomial):
    """Full Fiat-Shamir prove with the transcript on device; returns
    (prover_msgs, ProverState) exactly like the host path. `fs_rng` must be a
    `Blake2b512Rng` (its state is lifted, advanced on device, and restored)."""
    from .prover import ProverState

    nv = polynomial.num_variables

    lo, hi, products, degree, reusable = init_pair(polynomial)
    ts = lift_transcript(fs_rng)

    msgs_dev, rs_dev, carry, blen, (lo, hi) = chain_rounds(
        lo, hi, ts.carry(), ts.blen, products, degree, nv,
        keep_input_pair=reusable,
    )

    # ONE synchronization: proof + challenges + final transcript state
    msgs_h, rs_h, carry_h = fetch_chain_outputs(msgs_dev, rs_dev, carry, degree)

    prover_msgs = msgs_from_host(msgs_h, degree)
    randomness = [Fr(col_int(rd) * R_INV % P) for rd in rs_h]
    restore_transcript(fs_rng, carry_h, blen)

    state = ProverState(
        randomness=randomness,
        list_of_products=[(c, list(ix)) for c, ix in polynomial.products],
        stacked=(lo, hi),
        num_vars=nv,
        max_multiplicands=degree,
    )
    state.round = nv
    return prover_msgs, state
