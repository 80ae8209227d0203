"""Montgomery multiply-by-shared-scalar on the MXU (systolic array).

Every fold round multiplies whole tables by ONE shared challenge
(`prover.rs:87-89` semantics: `new[b] = lo[b] + r*(hi[b]-lo[b])`), the eq
tables multiply by per-variable constants, and phase-2 scaling multiplies by
`f2(u)` — all of the form `a_i * c` with `c` shared across lanes. The VPU
CIOS schedule (`fields/limbs_jnp._cios`) spends ~2720 u32 lane-ops per
multiply; here the multiplies move to the MXU:

    a * c = sum_j a8[j] * 2^(8j) * c  ==>  T[m] = sum_j a8[j] * c8[m-j]

i.e. the digit convolution of each lane with the *shared* digit vector of
`c` — a (W, 32) banded-matrix x (32, N) matrix product. With 8-bit digits
both operands are exact in bfloat16 (integers <= 255 < 2^8; bf16 holds
integers to 2^8) and every dot product accumulates <= 32 terms < 2^16 in
f32 (exact to 2^24), so the MXU computes the EXACT integer convolution at
matmul throughput. Montgomery reduction keeps the same structure: m =
(T mod R)*mu mod R and m*p are convolutions by the CONSTANT digit vectors
of mu = -p^-1 mod R and p — two more banded matmuls. The VPU keeps only
carry normalization (~600 lane-ops, ~4.5x less than CIOS).

Exactness bounds, checked inline: wide convolution digits < 32*255*255 <
2^21 (f32-exact); carry-chain accumulators < 2^22 (u32-exact). Results are
bit-identical to `limbs_jnp.mont_mul` (pinned by tests/test_mxu_mul.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.fr import NINV_FULL, NUM_DIGITS, P

_U32 = jnp.uint32
_D8 = 2 * NUM_DIGITS  # 32 8-bit digits per element
_W = 2 * _D8 - 1  # 63 wide product digits


def _const8(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (8 * i)) & 0xFF for i in range(n)], np.float32)


def _band_np(c8: np.ndarray, rows: int) -> np.ndarray:
    """(rows, 32) banded convolution matrix: B[m, j] = c8[m - j]."""
    m = np.arange(rows)[:, None] - np.arange(_D8)[None, :]
    out = np.where((m >= 0) & (m < len(c8)), c8[np.clip(m, 0, len(c8) - 1)], 0.0)
    return out.astype(jnp.bfloat16)


# constant reduction matrices: mu = -p^-1 mod 2^256 (truncated band: the
# convolution mod R keeps only digit weights < 32), and p (full band)
_MU_BAND = _band_np(_const8(NINV_FULL, _D8), _D8)  # (32, 32)
_P_BAND = _band_np(_const8(P, _D8), _W)  # (63, 32)


def _to8(a):
    """(16, N) u32 strict 16-bit digits -> (32, N) u32 8-bit digits."""
    lo = a & _U32(0xFF)
    hi = a >> _U32(8)
    return jnp.stack([lo, hi], axis=1).reshape((_D8,) + a.shape[1:])


def _from8(r8):
    """(32, N) strict 8-bit digits -> (16, N) strict 16-bit digits."""
    r = r8.reshape((NUM_DIGITS, 2) + r8.shape[1:])
    return r[:, 0] | (r[:, 1] << _U32(8))


def _chain8(rows, keep_carry: bool):
    """Carry-normalize relaxed 8-bit rows (< 2^22 each); returns (strict
    rows, carry) — carry dropped by callers reducing mod 2^256."""
    out = []
    carry = jnp.zeros_like(rows[0])
    for r in rows:
        t = r + carry
        out.append(t & _U32(0xFF))
        carry = t >> _U32(8)
    return out, (carry if keep_carry else None)


def _bf16(x_u32):
    """u32 (values < 2^8) -> bf16 via int32: Mosaic has no unsigned<->float
    casts (caught by tests/test_tpu_lowering.py); the int32 hop is exact."""
    return x_u32.astype(jnp.int32).astype(jnp.bfloat16)


def _conv(band, x8_bf):
    """(W, 32) bf16 band @ (32, N) bf16 -> (W, N) f32 exact -> u32."""
    t = jax.lax.dot_general(
        band, x8_bf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return t.astype(jnp.int32).astype(_U32)  # every digit < 2^21: exact


def mont_mul_scalar_mxu(a, c):
    """`a * c * R^-1 mod p` for a (16, ...) strict table and ONE shared
    strict scalar `c` (16,) — the multiplies run on the MXU as banded-matrix
    products; bit-identical to `limbs_jnp.mont_mul(a, c_column)`."""
    shape = a.shape[1:]
    n = int(np.prod(shape)) if shape else 1
    c8 = _to8(c.reshape(NUM_DIGITS, 1))
    cband = _traced_band(c8[:, 0])
    return mont_mul_band(a.reshape(NUM_DIGITS, n), cband).reshape(
        (NUM_DIGITS,) + shape
    )


def mont_mul_band(a, cband, mu_band=None, p_band=None):
    """Core MXU Montgomery multiply: a (16, N) strict by the prebuilt (63, 32)
    bf16 band of the shared scalar (`scalar_band`). Pure jnp ops — callable
    from XLA or from inside a Pallas kernel body (the dots hit the MXU in
    both; Mosaic pads the 32/63-sized dims to its tiles). Pallas kernels must
    pass the constant mu/p reduction bands as operands (kernels may not
    capture array constants); XLA callers leave them None."""
    if mu_band is None:
        mu_band = jnp.asarray(_MU_BAND)
    if p_band is None:
        p_band = jnp.asarray(_P_BAND)
    a8 = _bf16(_to8(a))

    # T = a * c: (63, N) wide digits < 32*255^2 < 2^21
    T = _conv(cband, a8)
    # xlo = T mod 2^256 as strict 8-bit digits (carry past digit 31 belongs
    # to T's high half and re-enters through y below)
    xlo_rows, c32 = _chain8([T[i] for i in range(_D8)], keep_carry=True)
    xlo8 = _bf16(jnp.stack(xlo_rows))
    # m = xlo * mu mod 2^256 (truncated band), normalized mod R
    m_rows, _ = _chain8(list(_conv(mu_band, xlo8)), keep_carry=False)
    m8 = _bf16(jnp.stack(m_rows))
    # y = T + m*p == 0 mod 2^256; result = y >> 256 < 2p
    mp = _conv(p_band, m8)
    # low half: strict digits are all zero by construction — only the carry
    # out of digit 31 survives (xlo strict + mp relaxed: cells < 2^22)
    carry = jnp.zeros_like(T[0])
    for i in range(_D8):
        carry = (xlo_rows[i] + mp[i] + carry) >> _U32(8)
    hi_rows = [T[_D8] + c32 + mp[_D8] + carry] + [
        T[i] + mp[i] for i in range(_D8 + 1, _W)
    ]
    hi_rows.append(jnp.zeros_like(T[0]))  # digit 63: value < 2p needs 32 digits
    res_rows, _ = _chain8(hi_rows, keep_carry=False)
    res = _from8(jnp.stack(res_rows))

    from ..fields import limbs_jnp as LJ

    return jnp.stack(LJ._cond_sub_p([res[i] for i in range(NUM_DIGITS)]))


def scalar_band(c):
    """(16,) strict scalar digits -> its (63, 32) bf16 convolution band
    (host-buildable per round; tiny — pass it into kernels as an operand)."""
    return _traced_band(_to8(c.reshape(NUM_DIGITS, 1))[:, 0])


def _traced_band(c8_col):
    """(32,) u32 traced 8-bit digits -> (63, 32) bf16 banded matrix."""
    m = jnp.arange(_W)[:, None] - jnp.arange(_D8)[None, :]
    take = jnp.take(c8_col, jnp.clip(m, 0, _D8 - 1), axis=0)
    return _bf16(jnp.where((m >= 0) & (m < _D8), take, 0))


@functools.lru_cache(maxsize=None)
def _jit_mont_mul_scalar():
    return jax.jit(mont_mul_scalar_mxu)
