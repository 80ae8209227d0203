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

import functools

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


@functools.lru_cache(maxsize=None)
def _diag_masks(nlanes_ndim: int):
    """Masks selecting, in the (17, 16) skew-reshape of the padded outer
    product, the entries of anti-diagonal r (low) and r+16 (high) in column r.

    Column r of the skew layout holds: rows q <= r -> diagonal r, row r+1 ->
    the zero pad, rows q >= r+2 -> diagonal r+16.
    """
    q = np.arange(_D + 1)[:, None]
    r = np.arange(_D)[None, :]
    shape = (_D + 1, _D) + (1,) * nlanes_ndim
    low = (q <= r).astype(np.uint32).reshape(shape)
    high = (q >= r + 2).astype(np.uint32).reshape(shape)
    return low, high  # numpy constants (safe to cache across traces)


def _diag_sums(m):
    """(16, 16, *B) entries < 2^16 -> (32, *B) anti-diagonal sums < 2^20."""
    lanes = m.shape[2:]
    pad = jnp.zeros((_D, 1) + lanes, _U32)
    skew = jnp.concatenate([m, pad], axis=1).reshape((_D + 1, _D) + lanes)
    mask_low, mask_high = _diag_masks(len(lanes))
    low = jnp.sum(skew * mask_low, axis=0)  # (16, B): diagonals 0..15
    high = jnp.sum(skew * mask_high, axis=0)  # (16, B): diagonals 16..31
    return jnp.concatenate([low, high], axis=0)


def _mul_wide(a, b):
    """Strict (16, *B) x (16, *B) -> relaxed (32, *B) digits < 2^21."""
    prod = a[:, None] * b[None, :]  # (16, 16, B); exact: < (2^16-1)^2 < 2^32
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


def _const_col(digits, nlanes_ndim: int):
    return np.asarray(digits, dtype=np.uint32).reshape((_D,) + (1,) * nlanes_ndim)


def mont_mul(a, b):
    """Montgomery multiply: a*b*R^-1 mod p, strict reduced digits in and out."""
    lanes_ndim = max(a.ndim, b.ndim) - 1
    x = _mul_wide(a, b)  # (32, B) relaxed < 2^21
    # normalize the low half: strict X mod 2^256 and its carry into digit 16
    xlo_rows, c16 = _chain([x[i] for i in range(_D)])
    xlo = jnp.stack(xlo_rows)
    # m = (X mod 2^256) * (-p^-1) mod 2^256
    m_relaxed = _mul_wide(xlo, _const_col(NINV_DIGITS, lanes_ndim))
    m_rows, _ = _chain([m_relaxed[i] for i in range(_D)])  # carry dropped: mod 2^256
    m = jnp.stack(m_rows)
    # X + m*p == 0 mod 2^256; result = (X + m*p) >> 256 < 2p
    mp = _mul_wide(m, _const_col(P_DIGITS, lanes_ndim))  # (32, B) < 2^21
    y_lo = xlo + mp[:_D]  # < 2^17
    # low half contributes only its carry chain (its strict digits are zero)
    carry = jnp.zeros_like(y_lo[0])
    for i in range(_D):
        carry = (y_lo[i] + carry) >> DIGIT_BITS
    y_hi = [x[_D] + c16 + mp[_D] + carry] + [x[i] + mp[i] for i in range(_D + 1, 2 * _D)]
    res_rows, _ = _chain(y_hi)  # value < 2p fits 16 digits
    return jnp.stack(_cond_sub_p(res_rows))


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
    """Host: strict wide digit column -> Python int (not mod-reduced)."""
    v = 0
    for i in range(w.shape[0]):
        v |= int(w[i]) << (DIGIT_BITS * i)
    return v
