"""Device (JAX) kernels for GKR phase initialization (SURVEY.md Stage 4).

The reference's phase-1 init is a scalar scatter loop over `f1`'s nonzeros
(`gkr_round_sumcheck/mod.rs:22-42`): fix `f1` at `g` (sparse), then
`a_hg[x] += v * f3[y]`. Random-index accumulation is TPU-hostile; the
idiomatic shape used here is:

1. **weight fold** — each entry's multilinear fixing weight
   `prod_i (bit_i ? r_i : 1-r_i)` as k batched Montgomery multiplies over all
   nonzeros at once (no sparse map mutation, duplicates stay unmerged — the
   scatter sums them anyway);
2. **gather** f3 at the y-part of each index and multiply;
3. **segment sum** over the x-part with 16->8-bit digit splitting so uint32
   scatter-adds cannot overflow (exact for < 2^26 colliding entries), then an
   exact mod-p reduction of the wide per-segment sums.

Phase 2 (`mod.rs:57-63`) reuses the same weight fold + segment sum with the
remaining index bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limbs_jnp as LJ
from ..fields import limbs_np as L
from ..fields.fr import Fr, NUM_DIGITS


def _points_arrays(points: list[Fr]):
    """Challenges -> stacked (k, 16, 1) Montgomery columns for r and 1-r."""
    r = np.stack([L.mont_scalar(p.v) for p in points])
    omr = np.stack([L.mont_scalar((Fr.one() - p).v) for p in points])
    return r, omr


def _weight_fold(indices, values, r_pts, omr_pts, k: int):
    """values * prod_{i<k} (bit_i(indices) ? r_i : 1-r_i), batched."""
    w = values
    for i in range(k):
        bit = ((indices >> i) & 1) == 1  # (nnz,)
        factor = jnp.where(bit[None, :], r_pts[i], omr_pts[i])  # (16, nnz)
        w = LJ.mont_mul(w, factor)
    return w


def _segment_reduce_mod_p(vals, seg_ids, num_segments: int):
    """Sum strict digit columns by segment, exactly, entirely on device.

    vals: (16, nnz) strict; returns (16, num_segments) strict reduced.
    Digits are split 16->8 bits before the uint32 scatter-add, so up to 2^24
    colliding entries stay exact; the wide per-segment sums are then
    carry-normalized and reduced mod p."""
    lo = (vals & 0xFF).astype(jnp.uint32)
    hi = (vals >> 8).astype(jnp.uint32)
    rows = jnp.concatenate([lo, hi], axis=0)  # (32, nnz), each < 2^8
    sums = jax.ops.segment_sum(rows.T, seg_ids, num_segments=num_segments).T
    slo, shi = sums[:NUM_DIGITS], sums[NUM_DIGITS:]  # each < 2^(8 + log2 nnz)
    # value = sum_d slo_d 2^16d + shi_d 2^(16d+8); rebuild relaxed 16-bit rows
    zero = jnp.zeros_like(slo[0])
    relaxed = []
    for d in range(NUM_DIGITS + 2):
        r = zero
        if d < NUM_DIGITS:
            r = r + slo[d] + ((shi[d] & 0xFF) << 8)
        if 1 <= d <= NUM_DIGITS:
            r = r + (shi[d - 1] >> 8)
        relaxed.append(r)  # < 2^27
    pad = (LJ.WIDE_DIGITS - len(relaxed))
    strict, _ = LJ._chain(relaxed + [zero] * pad)
    return LJ.reduce_wide(jnp.stack(strict))


@functools.lru_cache(maxsize=None)
def _compiled_phase1(nnz: int, dim: int):
    def fn(gbits, x, y, values, g_r, g_omr, f3_evals):
        w = _weight_fold(gbits, values, g_r, g_omr, dim)
        f3y = jnp.take(f3_evals, y, axis=1)  # (16, nnz)
        wv = LJ.mont_mul(w, f3y)
        hg = _segment_reduce_mod_p(wv, x, 1 << dim)
        return hg, w

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _compiled_phase2(nnz: int, dim: int):
    def fn(x, y, w, u_r, u_omr):
        w2 = _weight_fold(x, w, u_r, u_omr, dim)
        return _segment_reduce_mod_p(w2, y, 1 << dim)

    return jax.jit(fn)


def phase1_init_device(f1_indices: np.ndarray, f1_values: np.ndarray,
                       f3_evals: np.ndarray, g: list[Fr], dim: int):
    """Device h_g + fixed-f1 entries. Returns (h_g (16, 2^dim) np array,
    (x, y, w) device arrays for phase 2).

    Full indices can exceed int32 (3*dim bits); they are pre-split host-side
    into the g-bits (low dim), x (middle dim) and y (top dim) components,
    each < 2^dim."""
    idx = f1_indices.astype(np.int64)
    mask = (1 << dim) - 1
    gbits = (idx & mask).astype(np.int32)
    x = ((idx >> dim) & mask).astype(np.int32)
    y = (idx >> (2 * dim)).astype(np.int32)
    g_r, g_omr = _points_arrays(g)
    fn = _compiled_phase1(len(f1_indices), dim)
    hg, w = fn(
        jnp.asarray(gbits),
        jnp.asarray(x),
        jnp.asarray(y),
        jnp.asarray(f1_values),
        jnp.asarray(g_r),
        jnp.asarray(g_omr),
        jnp.asarray(f3_evals),
    )
    return np.asarray(hg), (jnp.asarray(x), jnp.asarray(y), w)


def phase2_init_device(carry, u: list[Fr], dim: int) -> np.ndarray:
    """Device f1(g, u, .) densified: (16, 2^dim) strict, natural order."""
    x, y, w = carry
    u_r, u_omr = _points_arrays(u)
    fn = _compiled_phase2(int(x.shape[0]), dim)
    return np.asarray(fn(x, y, w, jnp.asarray(u_r), jnp.asarray(u_omr)))
