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


def _cios(a, bj_rows, bshape):
    """Finely-interleaved Montgomery product (CIOS, 16-bit words).

    `bj_rows[j]` yields the j-th digit of b — a traced row or a Python int
    (constant digits: zero rows skip the multiply pass entirely). The key
    uint32 identity: x*y + c1 + c2 < 2^32 for 16-bit x, y, c1, c2, so every
    accumulator cell stays exact in uint32 with no wide intermediates — this
    beats the outer-product/anti-diagonal schedule ~5x on TPU (fewer
    multiplies, no (16,16,lanes) scratch tensors).
    """
    sh = jnp.broadcast_shapes(a.shape[1:], bshape)
    zero = jnp.zeros(sh, _U32)
    acc = [zero] * (_D + 2)
    for j in range(_D):
        acc = _cios_body(a, bj_rows[j], acc, zero)
    # final value < 2p < 2^256 (R = 2^256 > 4p), so acc[_D] == 0 here
    return jnp.stack(_cond_sub_p(acc[:_D]))


def _cios_body(a, bj, rows, zero):
    """One CIOS outer iteration on an explicit row list (shared by the
    unrolled and fori variants). rows: list of _D+2 accumulator rows."""
    C = zero
    skip_mult = isinstance(bj, int) and bj == 0
    if not skip_mult:
        bj = _U32(bj) if isinstance(bj, int) else bj
        for i in range(_D):
            t = rows[i] + a[i] * bj + C  # exact: < 2^32 (16-bit operands)
            rows[i] = t & DIGIT_MASK
            C = t >> DIGIT_BITS
        t = rows[_D] + C
        rows[_D] = t & DIGIT_MASK
        rows[_D + 1] = rows[_D + 1] + (t >> DIGIT_BITS)
    # Montgomery step: kill digit 0, shift everything down one digit
    m = (rows[0] * _U32(NINV_DIGITS[0])) & DIGIT_MASK
    t = rows[0] + m * _U32(P_DIGITS[0])  # ≡ 0 mod 2^16
    C = t >> DIGIT_BITS
    for i in range(1, _D):
        t = rows[i] + m * _U32(P_DIGITS[i]) + C
        rows[i - 1] = t & DIGIT_MASK
        C = t >> DIGIT_BITS
    t = rows[_D] + C
    rows[_D - 1] = t & DIGIT_MASK
    rows[_D] = rows[_D + 1] + (t >> DIGIT_BITS)
    rows[_D + 1] = zero
    return rows


def _cios_fori(a, b_rows, bshape, unroll: int = 1):
    """CIOS with the outer digit loop as `lax.fori_loop`. Functionally
    identical to the unrolled form but with an up-to-16x smaller trace —
    XLA:CPU's compile time explodes on the long unrolled carry chains (hours
    for two chained multiplies), and on the 1-core tunneled-TPU host the
    trace+lower+compile of the fully-unrolled round programs was a 400 s+
    cold wall (VERDICT round-2 #2). `unroll` trades trace size back for
    scheduler freedom. b_rows: (16, *bshape) array of b's digit rows.

    Inside a Pallas kernel trace (`kernel_trace()`), b's round digit is
    extracted with an iota compare+select chain instead of `b_rows[j]` —
    Mosaic has no dynamic_slice lowering — and `unroll` is clamped to
    Mosaic's {1, full} support; at full unroll the loop index is a lowering
    constant, so the selects fold away and the emitted code matches the
    hand-unrolled form."""
    import jax

    sh = jnp.broadcast_shapes(a.shape[1:], bshape)
    zero = jnp.zeros(sh, _U32)
    acc0 = jnp.stack([zero] * (_D + 2))
    in_kernel = in_kernel_trace()
    if in_kernel and unroll != 1:
        unroll = _D

    def body(j, acc):
        if in_kernel:
            bj = zero
            for i in range(_D):
                bj = jnp.where(j == i, b_rows[i], bj)
        else:
            bj = b_rows[j]
        rows = [acc[i] for i in range(_D + 2)]
        return jnp.stack(_cios_body(a, bj, rows, zero))

    acc = jax.lax.fori_loop(0, _D, body, acc0, unroll=unroll)
    return jnp.stack(_cond_sub_p([acc[i] for i in range(_D)]))


import threading as _threading

# Thread-local: concurrent traces (e.g. generic_prover._warm_family compiles
# three round programs in a ThreadPoolExecutor) must each see only their own
# in-kernel state — a shared module global let one thread's __exit__ clear
# the flag mid-trace of another thread's kernel, sending mont_mul down the
# dynamic-index path and a dynamic_slice into a Mosaic kernel jaxpr
# (round-3 postmortem: BENCH_r03.json rc=1, "Unimplemented primitive …
# dynamic_slice").
_KERNEL_TRACE = _threading.local()


def in_kernel_trace() -> bool:
    """True iff the CURRENT THREAD is inside a Pallas kernel body trace."""
    return getattr(_KERNEL_TRACE, "active", False)


class kernel_trace:
    """Context marking a Pallas-kernel body trace: limb ops must stay within
    Mosaic's lowering support (no dynamic_slice, fori unroll in {1, full}).
    Per-thread (see _KERNEL_TRACE): entering in one thread never affects a
    trace running concurrently in another."""

    def __enter__(self):
        self._prev = in_kernel_trace()
        _KERNEL_TRACE.active = True

    def __exit__(self, *exc):
        _KERNEL_TRACE.active = self._prev
        return False


_CIOS_OVERRIDE = _threading.local()


class cios_trace_mode:
    """Trace-time CIOS-mode override (thread-local, like `kernel_trace`).

    Used INSIDE a traced function body so everything that function traces
    uses the given mode regardless of the global default — e.g. the GKR
    phase-init programs trace with rolled ``fori``: their multiply time is
    negligible (the inits are gather-bound — RESULTS.md), but at the
    fori16 default their eq-fold traces made them the bulk of the GKR cold
    compile wall (410 s vs 116 s all-fori, COLD_COMPILE sweep round 4)."""

    def __init__(self, mode: str):
        self._mode = mode

    def __enter__(self):
        self._prev = getattr(_CIOS_OVERRIDE, "mode", None)
        _CIOS_OVERRIDE.mode = self._mode

    def __exit__(self, *exc):
        _CIOS_OVERRIDE.mode = self._prev
        return False


def _cios_mode() -> tuple[bool, int]:
    """(unrolled, fori_unroll_factor) for this backend/config.

    ``SUMCHECK_TPU_CIOS``: ``unroll`` (full 16x Python unroll — largest
    trace), ``fori`` (loop, 16x smaller trace), ``foriK`` (loop with K-way
    unrolled body; clamped to full inside Pallas kernels), ``auto``
    (default: measured on the v5e — fori16 keeps the warm runtime of the
    full unroll while the trace+lower wall drops ~3x; CPU loops un-unrolled
    to keep XLA:CPU compile sane). A `cios_trace_mode` context (trace-time,
    thread-local) takes precedence over the env var."""
    import os

    import jax

    mode = getattr(_CIOS_OVERRIDE, "mode", None) or os.environ.get(
        "SUMCHECK_TPU_CIOS", "auto"
    )
    if mode == "auto":
        mode = "fori16" if jax.default_backend() == "tpu" else "fori"
    if mode == "unroll":
        return True, 1
    if mode == "fori":
        return False, 1
    if mode.startswith("fori") and mode[4:].isdigit() and int(mode[4:]) > 0:
        return False, min(int(mode[4:]), NUM_DIGITS)
    raise ValueError(
        f"SUMCHECK_TPU_CIOS={mode!r}: expected unroll|fori|foriK (K >= 1)|auto"
    )


def mont_mul(a, b):
    """Montgomery multiply: a*b*R^-1 mod p, strict reduced digits in and out."""
    unrolled, k = _cios_mode()
    if unrolled:
        return _cios(a, [b[j] for j in range(_D)], b.shape[1:])
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    # align b's lane dims to bshape under its leading digit axis
    b_exp = b.reshape((_D,) + (1,) * (len(bshape) - (b.ndim - 1)) + b.shape[1:])
    return _cios_fori(a, jnp.broadcast_to(b_exp, (_D,) + bshape), bshape, k)


def mont_mul_const(a, digits: tuple):
    """Montgomery multiply by a compile-time digit tuple (Pallas-safe)."""
    unrolled, k = _cios_mode()
    if unrolled:
        return _cios(a, list(digits), ())
    cols = jnp.asarray(np.array(digits, np.uint32).reshape((_D,) + (1,) * (a.ndim - 1)))
    bshape = a.shape[1:]
    return _cios_fori(a, jnp.broadcast_to(cols, (_D,) + bshape), bshape, k)


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
