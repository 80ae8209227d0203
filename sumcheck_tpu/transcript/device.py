"""On-device Fiat-Shamir transcript: Blake2b-512 + arkworks rejection
sampling as JAX ops (uint32 pairs — TPU has no 64-bit integers).

Why: sumcheck is round-sequential — the round-i challenge is a hash of the
round-i message — so a host-side transcript forces a device→host→device sync
every round (~35 ms on a tunneled TPU, dwarfing the ~0.1 ms of round math).
Running feed/sample on device lets the host enqueue all `nv` rounds
asynchronously and fetch the whole proof in one transfer at the end.

Bit-exactness: this mirrors `transcript/blake2b_core.py` (itself tested
against `hashlib`) and the reference `Blake2b512Rng` (`/root/reference/
src/rng.rs:22-81`): `feed` = absorb serialized bytes; each `next_u64` =
finalize-a-clone, take 8 bytes, re-absorb the full 64-byte block; `fr_rand` =
ark-ff `UniformRand`: draw 4 u64 (LSW first), shave the top bit, reject if
>= modulus; the accepted bigint IS the Montgomery representation
(`rng.rs:61-80`; ark-ff 0.4 `Fp::rand`).

All feed/absorb lengths in the sumcheck schedule are multiples of 8 bytes and
statically known at trace time, so the pending-block buffer is a fixed
(16, 2) u32 word array plus a *static* Python byte count — no dynamic buffer
indexing ever reaches XLA. The rejection loop absorbs exactly 256 bytes per
attempt (4 × 64), a whole number of 128-byte blocks, so the static alignment
is invariant across `lax.while_loop` iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.fr import NUM_DIGITS, P_DIGITS, SHAVE_BITS
from .blake2b_core import BLOCK_BYTES, IV, SIGMA

_U32 = jnp.uint32
# ark-ff UniformRand masks the top u32 of the 256-bit draw down to MODULUS_BITS.
# np (NOT jnp): a module-level jnp scalar is a DEVICE array created eagerly at
# import; captured in traces, it forces lowering to block on a device fetch
# (measured: one such fetch through a busy tunnel stalled lowering ~9 min).
_SHAVE_MASK = np.uint32((1 << (32 - SHAVE_BITS)) - 1)
_LO32 = (1 << 32) - 1


def _const64_np(vals) -> np.ndarray:
    return np.array([(v & _LO32, (v >> 32) & _LO32) for v in vals], np.uint32)


def _const64(vals) -> jnp.ndarray:
    """Python u64 iterable -> (n, 2) u32 (lo, hi) device constant."""
    return jnp.asarray(_const64_np(vals))


_IV_NP = _const64_np(IV)


def _add64(a, b):
    lo = a[..., 0] + b[..., 0]
    carry = (lo < a[..., 0]).astype(_U32)
    return jnp.stack([lo, a[..., 1] + b[..., 1] + carry], axis=-1)


def _xor64(a, b):
    return a ^ b


def _ror64(x, n: int):
    lo, hi = x[..., 0], x[..., 1]
    if n == 32:
        return jnp.stack([hi, lo], axis=-1)
    if n < 32:
        nlo = (lo >> n) | (hi << (32 - n))
        nhi = (hi >> n) | (lo << (32 - n))
    else:  # 32 < n < 64: ror n == swap + ror (n-32)
        k = n - 32
        nlo = (hi >> k) | (lo << (32 - k))
        nhi = (lo >> k) | (hi << (32 - k))
    return jnp.stack([nlo, nhi], axis=-1)


def _g(a, b, c, d, x, y):
    """Vectorized Blake2b G over 4 lanes; operands (4, 2) u32."""
    a = _add64(_add64(a, b), x)
    d = _ror64(_xor64(d, a), 32)
    c = _add64(c, d)
    b = _ror64(_xor64(b, c), 24)
    a = _add64(_add64(a, b), y)
    d = _ror64(_xor64(d, a), 16)
    c = _add64(c, d)
    b = _ror64(_xor64(b, c), 63)
    return a, b, c, d


def compress(h, m, t, last: bool):
    """Blake2b F. h: (8,2) u32; m: (16,2) u32; t: () u32 scalar (total bytes
    incl. this block — transcripts stay far below 2^32); last: static."""
    iv = jnp.asarray(_IV_NP)
    va, vb = h[0:4], h[4:8]
    vc = iv[0:4]
    vd = iv[4:8]
    # v[12] ^= t (t_hi = 0); v[14] ^= ~0 if last
    vd = vd.at[0, 0].set(vd[0, 0] ^ t.astype(_U32))
    if last:
        vd = vd.at[2].set(vd[2] ^ _U32(0xFFFFFFFF))

    # 12 SIGMA rounds as a fori_loop (kept out of the unrolled trace — the
    # transcript runs once per sumcheck round; small graphs compile faster.
    # Measured: 3x-unrolling this loop changed warm prove times by < 3 ms
    # while tripling the transcript share of every chain program's compile,
    # so the rolled form wins on both axes that matter).
    sigma = jnp.asarray(np.array(SIGMA, np.int32))  # (12, 16)

    def round_body(r, vs):
        va, vb, vc, vd = vs
        s = sigma[r]
        # column step: G(v0,v4,v8,v12) .. G(v3,v7,v11,v15)
        x = m[s[0:8:2]]
        y = m[s[1:8:2]]
        va, vb, vc, vd = _g(va, vb, vc, vd, x, y)
        # diagonal step: rotate rows
        vb = jnp.roll(vb, -1, axis=0)
        vc = jnp.roll(vc, -2, axis=0)
        vd = jnp.roll(vd, -3, axis=0)
        x = m[s[8:16:2]]
        y = m[s[9:16:2]]
        va, vb, vc, vd = _g(va, vb, vc, vd, x, y)
        vb = jnp.roll(vb, 1, axis=0)
        vc = jnp.roll(vc, 2, axis=0)
        vd = jnp.roll(vd, 3, axis=0)
        return va, vb, vc, vd

    va, vb, vc, vd = jax.lax.fori_loop(0, 12, round_body, (va, vb, vc, vd))
    v = jnp.concatenate([va, vb, vc, vd], axis=0)  # (16, 2)
    return h ^ v[0:8] ^ v[8:16]


class DevTranscript:
    """Trace-time handle on a device transcript.

    Traced state: `h` (8,2) u32, `t` () u32 (bytes compressed), `buf` (16,2)
    u32 — the pending block, zero-padded past `blen`. Static state: `blen`
    (pending byte count, multiple of 8). Pass through jit/while_loop
    boundaries via `carry()` / `from_carry(carry, blen)`.
    """

    __slots__ = ("h", "t", "buf", "blen")

    def __init__(self, h, t, buf, blen: int):
        assert blen % 8 == 0 and 0 <= blen <= BLOCK_BYTES
        self.h, self.t, self.buf, self.blen = h, t, buf, blen

    # --- host <-> device ------------------------------------------------
    @classmethod
    def lift(cls, state_tuple) -> "DevTranscript":
        """From `Blake2b512Rng.state_tuple()` (host snapshot)."""
        h, t, buf = state_tuple
        assert len(buf) % 8 == 0, "transcript byte alignment must be 8"
        words = [int.from_bytes(buf[8 * i : 8 * i + 8], "little") for i in range(len(buf) // 8)]
        words += [0] * (16 - len(words))
        return cls(_const64(h), jnp.asarray(t, _U32), _const64(words), len(buf))

    def lower(self) -> tuple[list[int], int, bytes]:
        """To host `(h, t, buf)` — materializes the device arrays."""
        h = np.asarray(self.h)
        buf = np.asarray(self.buf)
        hw = [int(h[i, 0]) | (int(h[i, 1]) << 32) for i in range(8)]
        bb = b"".join(
            int(buf[i, 0]).to_bytes(4, "little") + int(buf[i, 1]).to_bytes(4, "little")
            for i in range(self.blen // 8)
        )
        return hw, int(np.asarray(self.t)), bb

    # --- while_loop plumbing ---------------------------------------------
    def carry(self):
        return (self.h, self.t, self.buf)

    @classmethod
    def from_carry(cls, carry, blen: int) -> "DevTranscript":
        return cls(carry[0], carry[1], carry[2], blen)

    # --- hashing ----------------------------------------------------------
    def absorb(self, words, nbytes: int) -> "DevTranscript":
        """Absorb `nbytes` (static, multiple of 8) from `words` ((k,2) u32,
        k = nbytes/8). Mirrors `Blake2b512.update`."""
        assert nbytes % 8 == 0 and words.shape[0] == nbytes // 8
        total = self.blen + nbytes
        pend = jnp.concatenate([self.buf[: self.blen // 8], words], axis=0)
        h, t = self.h, self.t
        while total > BLOCK_BYTES:
            t = t + _U32(BLOCK_BYTES)
            h = compress(h, pend[:16], t, last=False)
            pend = pend[16:]
            total -= BLOCK_BYTES
        pad = jnp.zeros((16 - pend.shape[0], 2), _U32)
        return DevTranscript(h, t, jnp.concatenate([pend, pad], axis=0), total)

    def finalize_clone(self):
        """Digest of a clone of the running state: (8,2) u32 = 64 bytes LE."""
        return compress(self.h, self.buf, self.t + _U32(self.blen), last=True)

    def next_u64(self) -> tuple[jnp.ndarray, "DevTranscript"]:
        """One `fill_bytes(8)`: emit word 0 of a finalized clone, re-absorb
        the full 64-byte block (`rng.rs:61-80` semantics)."""
        block = self.finalize_clone()
        return block[0], self.absorb(block, 64)


def blen_after_feed(blen: int, nbytes: int) -> int:
    """Static pending-byte count after absorbing `nbytes`. (`fr_rand` leaves
    the count unchanged: each attempt absorbs 256 bytes = 2 whole blocks.)"""
    total = blen + nbytes
    while total > BLOCK_BYTES:
        total -= BLOCK_BYTES
    return total


def _lt_p(digits):
    """digits (16,) u32 strict -> bool: value < p (borrow-chain compare)."""
    borrow = _U32(0)
    for i in range(NUM_DIGITS):
        t = digits[i] + _U32((1 << 16) - P_DIGITS[i]) - borrow
        borrow = _U32(1) - (t >> 16)
    return borrow == _U32(1)


def _words_to_digits(words):
    """(4, 2) u32 (lo, hi per u64, LSW first) -> (16,) u32 strict 16-bit."""
    flat = words.reshape(8)  # [w0lo, w0hi, w1lo, w1hi, ...]
    return jnp.stack([(flat[i // 2] >> (16 * (i % 2))) & _U32(0xFFFF) for i in range(16)])


def fr_rand(ts: DevTranscript) -> tuple[jnp.ndarray, DevTranscript]:
    """Sample one Fr challenge exactly as `ark_ff::UniformRand` over this
    transcript. Returns ((16,) u32 strict digits — the *Montgomery*
    representation, i.e. the raw accepted draw — and the advanced transcript).
    """
    blen = ts.blen

    def attempt(carry):
        t = DevTranscript.from_carry(carry[0], blen)
        ws = []
        for _ in range(4):
            w, t = t.next_u64()
            ws.append(w)
        words = jnp.stack(ws)  # (4, 2)
        words = words.at[3, 1].set(words[3, 1] & _SHAVE_MASK)  # num_bits_to_shave()
        digits = _words_to_digits(words)
        ok = _lt_p(digits)
        return t.carry(), digits, ok

    def cond(state):
        return ~state[2]

    def body(state):
        carry, digits, ok = attempt(state)
        return (carry, digits, ok)

    init = (ts.carry(), jnp.zeros((NUM_DIGITS,), _U32), jnp.asarray(False))
    carry, digits, _ = jax.lax.while_loop(cond, body, (init[0], init[1], init[2]))
    return digits, DevTranscript.from_carry(carry, blen)


# ---------------------------------------------------------------------------
# Dynamic-blen transcript ops (shape-generic chained prover)
#
# The static-`blen` path above compiles one tiny program per pending-byte
# count (~16 programs over a prove). The ops below carry `blen` as a traced
# u32 instead, so ONE compiled round step serves every round — the fix for
# the cold-compile wall (one jit per table size AND per byte offset).
# State tuple: (h (8,2) u32, t () u32, buf (16,2) u32, blen () u32).
# ---------------------------------------------------------------------------

def absorb_dyn(state, words, nbytes: int):
    """Absorb `nbytes` (static, multiple of 8) at a *dynamic* pending offset.

    Mirrors `Blake2b512.update`: append to the pending block, compress every
    full 128-byte block (0..ncomp_max of them, trip count dynamic), keep the
    remainder pending. `words`: (nbytes/8, 2) u32."""
    h, t, buf, blen = state
    k = words.shape[0]
    assert nbytes % 8 == 0 and k == nbytes // 8
    ncomp_max = (BLOCK_BYTES + nbytes - 1) // BLOCK_BYTES
    cap = 16 * (ncomp_max + 1)
    ext = jnp.zeros((cap, 2), _U32)
    ext = jax.lax.dynamic_update_slice(ext, buf, (0, 0))
    w0 = (blen >> 3).astype(jnp.int32)
    ext = jax.lax.dynamic_update_slice(ext, words, (w0, 0))
    total = blen + _U32(nbytes)
    # host model: `while total > 128: compress; total -= 128`
    ncomp = ((total - _U32(1)) // _U32(BLOCK_BYTES)).astype(jnp.int32)

    # Dynamic-trip loop beats a predicated unroll here: an unconditional
    # compress per step (discarded by select when dead) measured ~13% slower
    # end-to-end — fr_rand's four 64-byte absorbs only compress on two of the
    # four steps, and compress itself is the expensive part.
    def body(i, ht):
        hh, tt = ht
        m = jax.lax.dynamic_slice(ext, (16 * i, 0), (16, 2))
        tt = tt + _U32(BLOCK_BYTES)
        return compress(hh, m, tt, last=False), tt

    h, t = jax.lax.fori_loop(0, ncomp, body, (h, t))
    buf = jax.lax.dynamic_slice(ext, (16 * ncomp, 0), (16, 2))
    blen = total - _U32(BLOCK_BYTES) * ncomp.astype(_U32)
    return (h, t, buf, blen)


def next_u64_dyn(state):
    """One `fill_bytes(8)` with dynamic pending length: emit word 0 of a
    finalized clone, re-absorb the 64-byte block (`rng.rs:61-80`)."""
    h, t, buf, blen = state
    block = compress(h, buf, t + blen, last=True)
    return block[0], absorb_dyn(state, block, 64)


def fr_rand_dyn(state):
    """ark-ff rejection sampling over the dynamic-blen transcript. Returns
    ((16,) u32 Montgomery digits, new state)."""

    def attempt(st):
        ws = []
        for _ in range(4):
            w, st = next_u64_dyn(st)
            ws.append(w)
        words = jnp.stack(ws)
        words = words.at[3, 1].set(words[3, 1] & _SHAVE_MASK)
        digits = _words_to_digits(words)
        return st, digits, _lt_p(digits)

    def cond(carry):
        return ~carry[2]

    def body(carry):
        return attempt(carry[0])

    init = (state, jnp.zeros((NUM_DIGITS,), _U32), jnp.asarray(False))
    st, digits, _ = jax.lax.while_loop(cond, body, body(init))
    return digits, st


def feed_fr_vec_dyn(state, digits_canonical):
    """Absorb a `Vec<Fr>` (u64 LE length prefix + 32 LE bytes/element) at a
    dynamic pending offset. digits_canonical: (16, k) canonical residues."""
    k = digits_canonical.shape[1]
    d = digits_canonical
    lo = d[0::2] | (d[1::2] << 16)
    words = jnp.moveaxis(lo, 1, 0).reshape(4 * k, 2)
    prefix = _const64([k])
    return absorb_dyn(state, jnp.concatenate([prefix, words], axis=0), 8 + 32 * k)


def feed_fr_vec(ts: DevTranscript, digits_canonical) -> DevTranscript:
    """Absorb a `Vec<Fr>`: u64 LE length prefix + 32 canonical LE bytes per
    element (arkworks `serialize_uncompressed`). digits_canonical: (16, k)
    strict u32 (canonical residues, NOT Montgomery)."""
    k = digits_canonical.shape[1]
    d = digits_canonical
    # digit pairs -> u32 halves of each u64 word: w[j] = d[4j] | d[4j+1]<<16 ...
    lo = d[0::2] | (d[1::2] << 16)  # (8, k): u32 halves, word-major
    words = jnp.moveaxis(lo, 1, 0).reshape(4 * k, 2)  # element-major (4k, 2)
    prefix = _const64([k])
    return ts.absorb(jnp.concatenate([prefix, words], axis=0), 8 + 32 * k)
