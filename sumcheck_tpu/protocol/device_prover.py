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
def _chained_step(
    half: int,
    num_slots: int,
    products: tuple,
    degree: int,
    blen_in: int,
    do_fold: bool,
    use_pallas: bool,
    block: int,
    interpret: bool,
):
    """One fused round: [fold by r] -> evaluate at t=0..d -> reduce ->
    feed transcript -> sample next challenge. Returns (jitted fn, blen_out).

    fn(lo, hi, carry, r_digits, coeffs) ->
        ((new_lo, new_hi), carry', canon_evals (16, d+1), r' (16,))
    """
    import jax
    import jax.numpy as jnp

    blen_out = blen_after_feed(blen_in, 8 + 32 * (degree + 1))
    ones_slot = num_slots - 1
    idx_np = np.array([list(ix) for ix in products], np.int32)

    def fn(lo, hi, carry, r_digits, coeffs):
        ts = DevTranscript.from_carry(carry, blen_in)
        if use_pallas:
            from ..ops.round_pallas import round_pallas

            pair, sums = round_pallas(
                lo, hi, r_digits, jnp.moveaxis(coeffs, 1, 0),
                products, degree, do_fold,
                block=block, interpret=interpret,
            )
            if not do_fold:
                pair = (lo, hi)
        else:
            stacked = jnp.concatenate([lo, hi], axis=2)
            if do_fold:
                stacked = engine.fold_tables(
                    engine.DEVICE, stacked, r_digits[:, None, None]
                )
            sums = engine.round_sums(
                engine.DEVICE,
                stacked,
                coeffs[:, :, None, None],  # (16, P, 1, 1)
                jnp.asarray(idx_np),
                degree,
            )
            m = stacked.shape[2] // 2
            pair = (stacked[:, :, :m], stacked[:, :, m:])
        mont = LJ.reduce_wide(sums)  # (16, d+1) Montgomery-form evals
        canon = LJ.mont_mul_const(mont, _ONE_DIGITS)  # *R^-1: canonical
        ts = feed_fr_vec(ts, canon)
        r_new, ts = fr_rand(ts)
        return pair, ts.carry(), canon, r_new

    donate = (0, 1) if do_fold else ()
    return jax.jit(fn, donate_argnums=donate), blen_out


def init_pair(polynomial):
    """Stack the unique tables (device-cached, bit-reversed — see
    `DenseMLE.device_bitrev`) plus the constant-one slot into the (lo, hi)
    half pair the round kernels consume."""
    import jax.numpy as jnp

    nv = polynomial.num_variables
    n = 1 << nv
    tabs = [m.device_bitrev() for m in polynomial.flattened_ml_extensions]

    @functools.partial(__import__("jax").jit, static_argnums=(1,))
    def stack(ts, n):
        ones = jnp.broadcast_to(
            jnp.asarray(L.mont_scalar(1)), (NUM_DIGITS, n)
        )
        s = jnp.stack(list(ts) + [ones], axis=1)  # (16, U+1, n)
        return s[:, :, : n // 2], s[:, :, n // 2 :]

    return stack(tuple(tabs), n)


def chain_rounds(lo, hi, carry, blen, products, degree, coeffs, num_rounds):
    """Enqueue `num_rounds` fused rounds (no host sync). Returns
    (msgs_dev, rs_dev, carry, blen, (lo, hi)) — all device handles; `rs_dev`
    holds the sampled challenge digits (Montgomery form) per round."""
    import jax.numpy as jnp

    from ..utils.config import get_config

    cfg = get_config()
    num_slots = lo.shape[1]
    msgs_dev, rs_dev = [], []
    r = jnp.zeros((NUM_DIGITS,), jnp.uint32)
    for i in range(num_rounds):
        half = lo.shape[2]
        use_pallas = cfg.use_pallas(2 * half) and not cfg.pallas_interpret
        fn, blen = _chained_step(
            half, num_slots, products, degree, blen,
            do_fold=(i > 0),
            use_pallas=use_pallas,
            block=min(cfg.pallas_block, max(half // 2, 1)),
            interpret=cfg.pallas_interpret,
        )
        (lo, hi), carry, canon, r = fn(lo, hi, carry, r, coeffs)
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


def products_and_coeffs(polynomial):
    """Static padded index tuples + (16, P) Montgomery coefficient columns
    (device upload cached on the polynomial — it is append-only via
    `add_product`, and the cache key includes the product count)."""
    import jax.numpy as jnp

    ones_slot = len(polynomial.flattened_ml_extensions)
    max_len = max(len(ix) for _, ix in polynomial.products)
    products = tuple(
        tuple(list(ix) + [ones_slot] * (max_len - len(ix)))
        for _, ix in polynomial.products
    )
    cache = getattr(polynomial, "_dev_coeffs", None)
    if cache is not None and cache[0] == products:
        return products, cache[1]
    coeffs = jnp.asarray(
        np.stack([L.mont_scalar(c.v)[:, 0] for c, _ in polynomial.products], axis=1)
    )
    try:
        polynomial._dev_coeffs = (products, coeffs)
    except AttributeError:
        pass
    return products, coeffs


def prove_chained(fs_rng, polynomial):
    """Full Fiat-Shamir prove with the transcript on device; returns
    (prover_msgs, ProverState) exactly like the host path. `fs_rng` must be a
    `Blake2b512Rng` (its state is lifted, advanced on device, and restored)."""
    from .prover import ProverState

    nv = polynomial.num_variables
    degree = polynomial.max_multiplicands
    products, coeffs = products_and_coeffs(polynomial)

    lo, hi = init_pair(polynomial)
    ts = lift_transcript(fs_rng)

    msgs_dev, rs_dev, carry, blen, (lo, hi) = chain_rounds(
        lo, hi, ts.carry(), ts.blen, products, degree, coeffs, nv
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
