"""Device (JAX) limb arithmetic for Fr — uint32-only, TPU-friendly.

A vector of N field elements is a `(NUM_DIGITS, ...) uint32` array in
Montgomery form, digit axis leading (trailing axes map to TPU vector lanes),
every digit < 2^16 ("strict" form). All ops use only uint32/int32 arithmetic
(TPU has no 64-bit integers); `limbs_np.py` is the uint64 reference model
these are tested against.

Multiplication uses an XLA-friendly *full-word Montgomery* schedule (compact
trace, wide vector ops):

1. wide product via one 16x16 digit outer product, split lo/hi, and a
   "skew reshape" that turns anti-diagonal sums into two masked column sums;
2. m = (X mod 2^256) * (-p^-1 mod 2^256) mod 2^256 (one more outer product);
3. X + m*p, then the high 16 digits are the Montgomery-reduced result (< 2p).

Digit products are < 2^32 (exact in uint32) and all relaxed accumulator
digits stay < 2^22; overflow bounds are noted inline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .fr import DIGIT_BITS, DIGIT_MASK, NINV_DIGITS, NUM_DIGITS, P_DIGITS

# Sums over up to 2^(32-16) lanes of strict digits fit in uint32; wider sums
# use a two-level reduction. A fully-normalized sum of up to 2^64 terms fits
# in NUM_DIGITS + 4 digits.
WIDE_DIGITS = NUM_DIGITS + 4
_U32 = jnp.uint32
_LANE_SUM_MAX = 1 << (32 - DIGIT_BITS)
_D = NUM_DIGITS


def _diag_masks(nlanes_ndim: int):
    """Masks selecting, in the (17, 16) skew-reshape of the padded outer
    product, the entries of anti-diagonal r (low) and r+16 (high) in column r.

    Column r of the skew layout holds: rows q <= r -> diagonal r, row r+1 ->
    the zero pad, rows q >= r+2 -> diagonal r+16.

    Built from iota in-trace (no captured array constants — required inside
    Pallas kernels; XLA constant-folds them in ordinary jit).
    """
    import jax

    shape = (_D + 1, _D) + (1,) * max(nlanes_ndim, 0)
    if nlanes_ndim < 1:
        shape = (_D + 1, _D)
    q = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    low = (q <= r).astype(jnp.uint32)
    high = (q >= r + 2).astype(jnp.uint32)
    return low, high


def _diag_sums(m):
    """(16, 16, *B) entries < 2^16 -> (32, *B) anti-diagonal sums < 2^20."""
    lanes = m.shape[2:]
    pad = jnp.zeros((_D, 1) + lanes, _U32)
    skew = jnp.concatenate([m, pad], axis=1).reshape((_D + 1, _D) + lanes)
    mask_low, mask_high = _diag_masks(len(lanes))
    # sum in int32: Mosaic lacks unsigned reductions; 17 terms < 2^16 each
    skew_i = skew.astype(jnp.int32)
    low = jnp.sum(skew_i * mask_low.astype(jnp.int32), axis=0).astype(_U32)
    high = jnp.sum(skew_i * mask_high.astype(jnp.int32), axis=0).astype(_U32)
    return jnp.concatenate([low, high], axis=0)


def _mul_wide(a, b):
    """Strict (16, *B) x (16, *B) -> relaxed (32, *B) digits < 2^21."""
    prod = a[:, None] * b[None, :]  # (16, 16, B); exact: < (2^16-1)^2 < 2^32
    return _combine_wide(prod)


def _mul_wide_const(a, digits):
    """Strict (16, *B) x compile-time digit tuple -> relaxed (32, *B).

    Digit products are scalar multiplies (no captured constant arrays)."""
    prod = jnp.stack([a * _U32(d) for d in digits], axis=1)  # (16, 16, B)
    return _combine_wide(prod)


def _combine_wide(prod):
    s_lo = _diag_sums(prod & DIGIT_MASK)
    s_hi = _diag_sums(prod >> DIGIT_BITS)
    # weight the hi parts by 2^16 = shift up one digit (s_hi[31] is 0)
    s_hi_shifted = jnp.concatenate([jnp.zeros((1,) + s_hi.shape[1:], _U32), s_hi[:-1]], axis=0)
    return s_lo + s_hi_shifted


def _chain(rows, carry_in=None):
    """Sequential carry propagation over a list of relaxed rows -> (strict
    rows, carry_out)."""
    out = []
    carry = carry_in if carry_in is not None else jnp.zeros_like(rows[0])
    for r in rows:
        t = r + carry
        out.append(t & DIGIT_MASK)
        carry = t >> DIGIT_BITS
    return out, carry


def _mont_reduce(x):
    """Full-word Montgomery reduction of a relaxed 32-row wide product:
    returns strict reduced (x * R^-1 mod p) as (16, B)."""
    # normalize the low half: strict X mod 2^256 and its carry into digit 16
    xlo_rows, c16 = _chain([x[i] for i in range(_D)])
    xlo = jnp.stack(xlo_rows)
    # m = (X mod 2^256) * (-p^-1) mod 2^256
    m_relaxed = _mul_wide_const(xlo, NINV_DIGITS)
    m_rows, _ = _chain([m_relaxed[i] for i in range(_D)])  # carry dropped: mod 2^256
    m = jnp.stack(m_rows)
    # X + m*p == 0 mod 2^256; result = (X + m*p) >> 256 < 2p
    mp = _mul_wide_const(m, P_DIGITS)  # (32, B) < 2^21
    y_lo = xlo + mp[:_D]  # < 2^17
    # low half contributes only its carry chain (its strict digits are zero)
    carry = jnp.zeros_like(y_lo[0])
    for i in range(_D):
        carry = (y_lo[i] + carry) >> DIGIT_BITS
    y_hi = [x[_D] + c16 + mp[_D] + carry] + [x[i] + mp[i] for i in range(_D + 1, 2 * _D)]
    res_rows, _ = _chain(y_hi)  # value < 2p fits 16 digits
    return jnp.stack(_cond_sub_p(res_rows))


def mont_mul(a, b):
    """Montgomery multiply: a*b*R^-1 mod p, strict reduced digits in and out."""
    return _mont_reduce(_mul_wide(a, b))


def mont_mul_const(a, digits: tuple):
    """Montgomery multiply by a compile-time digit tuple (Pallas-safe)."""
    return _mont_reduce(_mul_wide_const(a, digits))


def cond_sub_p(a):
    """Public conditional subtraction: strict (16, ...) in [0, 2p) -> [0, p)."""
    return jnp.stack(_cond_sub_p([a[i] for i in range(_D)]))


def reduce_wide(wide):
    """Strict wide digits (W, ...), 16 < W <= 32 -> (16, ...) reduced mod p.

    Device analog of `limbs_np.reduce_wide`: value = hi*2^256 + lo with
    hi*2^256 == montmul(hi, R^2) (mod p); lo < 2^256 < 4p."""
    from .fr import R2

    w = wide.shape[0]
    assert _D < w <= 2 * _D
    r2_digits = tuple((R2 >> (DIGIT_BITS * i)) & DIGIT_MASK for i in range(_D))
    lo = cond_sub_p(cond_sub_p(wide[:_D]))
    hi = jnp.concatenate(
        [wide[_D:], jnp.zeros((2 * _D - w,) + wide.shape[1:], _U32)], axis=0
    )
    return add(lo, mont_mul_const(hi, r2_digits))


def _cond_sub_p(rows):
    """rows strict, value in [0, 2p) -> [0, p). Borrow-chain compare+select."""
    diff = []
    borrow = jnp.zeros_like(rows[0])
    for i in range(NUM_DIGITS):
        t = rows[i] + _U32((1 << DIGIT_BITS) - P_DIGITS[i]) - borrow
        diff.append(t & DIGIT_MASK)
        borrow = _U32(1) - (t >> DIGIT_BITS)
    geq = borrow == 0  # no final borrow => rows >= p
    return [jnp.where(geq, d, r) for d, r in zip(diff, rows)]


def add(a, b):
    """Modular add; strict reduced in/out. a, b: (16, ...) uint32."""
    rows, _ = _chain([a[i] + b[i] for i in range(NUM_DIGITS)])
    return jnp.stack(_cond_sub_p(rows))


def sub(a, b):
    """Modular subtract; strict reduced in/out."""
    out = []
    carry = jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), jnp.int32)
    for i in range(NUM_DIGITS):
        t = a[i].astype(jnp.int32) + jnp.int32(P_DIGITS[i]) - b[i].astype(jnp.int32) + carry
        out.append((t & DIGIT_MASK).astype(_U32))
        carry = t >> DIGIT_BITS  # arithmetic shift: -1 on borrow
    return jnp.stack(_cond_sub_p(out))


def sum_lanes_wide(a, axis: int = 1):
    """Exact integer sum over one axis of a strict digit array.

    (16, ..., N, ...) -> (WIDE_DIGITS, ...): strict wide digits, equal to the
    integer sum (NOT reduced mod p — the host reduces and un-Montgomerys).

    Two-level reduction keeps every uint32 partial below overflow for
    N < 2^32 lanes.
    """
    n = a.shape[axis]
    a = jnp.moveaxis(a, axis, -1)  # (16, ..., N)
    if n > _LANE_SUM_MAX:
        blocks = -(-n // _LANE_SUM_MAX)
        padn = blocks * _LANE_SUM_MAX - n
        if padn:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, padn)])
        a = a.reshape(a.shape[:-1] + (blocks, _LANE_SUM_MAX))
        part = jnp.sum(a, axis=-1, dtype=_U32)  # (16, ..., blocks): exact
        zero = jnp.zeros_like(part[0])
        rows, _ = _chain([part[i] for i in range(NUM_DIGITS)] + [zero] * (WIDE_DIGITS - NUM_DIGITS))
        s = jnp.sum(jnp.stack(rows), axis=-1, dtype=_U32)  # blocks <= 2^16: exact
    else:
        s = jnp.sum(a, axis=-1, dtype=_U32)  # (16, ...): digits < 2^32
        s = jnp.concatenate(
            [s, jnp.zeros((WIDE_DIGITS - NUM_DIGITS,) + s.shape[1:], _U32)], axis=0
        )
    rows, _ = _chain([s[i] for i in range(WIDE_DIGITS)])
    return jnp.stack(rows)


def wide_to_int(w: np.ndarray) -> int:
    """Host: wide digit column -> Python int (not mod-reduced).

    Uses addition, not OR: digits may be *relaxed* (> 16 bits — e.g. the
    result of a cross-shard psum of strict digit vectors)."""
    v = 0
    for i in range(w.shape[0]):
        v += int(w[i]) << (DIGIT_BITS * i)
    return v
