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
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limbs_jnp as LJ
from ..fields import limbs_np as L
from ..fields.limbs_jnp import cios_trace_mode
from ..fields.fr import Fr, NUM_DIGITS

# shared-scalar multiplies at or above this lane count take the MXU path
# when `mxu_fold` is on (tiny tables aren't worth the matmul dispatch)
MXU_MIN_LANES = 1 << 11


def _points_arrays(points: list[Fr]):
    """Challenges -> stacked (k, 16, 1) Montgomery columns for r and 1-r."""
    r = np.stack([L.mont_scalar(p.v) for p in points])
    omr = np.stack([L.mont_scalar((Fr.one() - p).v) for p in points])
    return r, omr


# at or above this many eq-variables the weight fold gathers from TWO
# half-size tables instead of one 2^k table (see `_weight_fold`). Modes
# (SUMCHECK_TPU_KRON_EQ): "1" gathers the half-tables with jnp.take —
# measured on the v5e at GKR nv=18 it buys ~3 ms warm (92.1 vs 94.9 ms
# best) but the small-table gathers lower to enormous HLO and the phase
# programs' cold compile blows up from ~45 s to ~21 MINUTES — the wrong
# default against a <120 s cold-compile budget; "mxu" replaces the
# small-table gathers with one-hot bf16 MXU matmuls (`_take_small_mxu`) —
# tiny HLO, flat compile — and applies the split only where the big-table
# gather is actually arbitrary (phase 2's x-bit fold; phase 1's entries
# arrive x-sorted, so its big gather is near-monotone and already cheap).
# "auto" (default): "mxu" on TPU (measured A/B, GKR nv=18: 91.0 ms best =
# 10.4x vs 95.4 ms without), off elsewhere (host gathers are cheap).
_KRON_MODE = os.environ.get("SUMCHECK_TPU_KRON_EQ", "auto")
_KRON_MODE = None if _KRON_MODE in ("", "0", "off") else _KRON_MODE
_KRON_MIN_K = 12


def _kron_mode() -> str | None:
    """Resolved kron-split mode (lazy: 'auto' needs the backend)."""
    if _KRON_MODE == "auto":
        return "mxu" if jax.default_backend() == "tpu" else None
    return _KRON_MODE


def _take_small_mxu(table, idx):
    """Gather a SMALL (16, T) digit table at arbitrary `idx` -> (16, nnz)
    via a one-hot bf16 MXU matmul.

    Exact: the table splits into 8-bit halves (< 2^8, bf16-representable),
    the one-hot matrix is 0/1, and each f32 output accumulates exactly one
    term — so the dot is integer-exact and the recombined uint32 digits are
    bit-identical to `jnp.take`. Unlike XLA's small-table gather lowering
    (enormous HLO, ~21 min compile at T=2^9 inside the fused phase
    programs) the dot lowers to one tiny MXU op; the one-hot (T, nnz) bf16
    operand is the cost (~2 * T * nnz bytes of HBM traffic), still well
    under an arbitrary 2^18-lane HBM gather (~2.9 ms)."""
    T = table.shape[1]
    onehot = (idx[None, :] == jax.lax.iota(jnp.int32, T)[:, None]).astype(
        jnp.bfloat16
    )  # (T, nnz)
    halves = jnp.concatenate([table & 0xFF, table >> 8], axis=0).astype(
        jnp.bfloat16
    )  # (32, T), each < 2^8
    g = jax.lax.dot_general(
        halves, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint32)  # exact: one-hot selects a single 8-bit term
    return g[:NUM_DIGITS] | (g[NUM_DIGITS:] << 8)


def _weight_fold(indices, values, r_pts, omr_pts, k: int,
                 axis_name: str | None = None, sorted_idx: bool = False):
    """values * prod_{i<k} (bit_i(indices) ? r_i : 1-r_i), batched.

    Computed via the eq table, NOT via k per-entry multiply-select passes:
    k sequential (16, nnz) Montgomery multiplies are ALU-bound (~11 ms each
    at nnz=2^20 — the k=20 chain was 117 ms and dominated the whole GKR
    prove), while the doubling build is ~2 multiply-equivalents total plus
    one fast gather. Inside a shard_map body, pass `axis_name` so the
    doubling work is split 1/S across shards (each builds its high-bit
    slice, one all_gather replicates the table for the arbitrary-index
    gather).

    KRON SPLIT (k >= _KRON_MIN_K, round-5 measured): a (16, nnz)-out gather
    from a (16, 2^18) table costs ~12x one from a (16, 2^9) table on the
    v5e (the small table lives in VMEM; the big one streams HBM at random).
    eq factors as kron(eq_hi, eq_lo) over the top/bottom index bits, so the
    fold gathers from TWO half-size tables and multiplies:
    eq[j] = eq_lo[j & m] * eq_hi[j >> kl]. One extra (16, nnz) Montgomery
    multiply buys ~10x cheaper gathers; the field product is exact either
    way, so proof bytes are unchanged."""
    if axis_name is not None:
        eq = _eq_table_sharded(r_pts, omr_pts, k, axis_name)
        return LJ.mont_mul(values, jnp.take(eq, indices, axis=1))
    mode = _kron_mode()
    if mode and k >= _KRON_MIN_K and not (sorted_idx and mode == "mxu"):
        kl = k // 2
        eq_lo = _eq_table(r_pts[:kl], omr_pts[:kl], kl)
        eq_hi = _eq_table(r_pts[kl:], omr_pts[kl:], k - kl)
        if mode == "mxu":
            lo_g = _take_small_mxu(eq_lo, indices & ((1 << kl) - 1))
            hi_g = _take_small_mxu(eq_hi, indices >> kl)
        else:
            lo_g = jnp.take(eq_lo, indices & ((1 << kl) - 1), axis=1)
            hi_g = jnp.take(eq_hi, indices >> kl, axis=1)
        return LJ.mont_mul(LJ.mont_mul(values, lo_g), hi_g)
    eq = _eq_table(r_pts, omr_pts, k)
    return LJ.mont_mul(values, jnp.take(eq, indices, axis=1))


def _eq_table(r_pts, omr_pts, k: int):
    """(16, 2^k) eq table: eq[j] = prod_i (bit_i(j) ? r_i : 1-r_i), built by
    k doublings (index convention: bit i of j = variable i, low bits first).
    r_pts/omr_pts: indexable (k, 16, 1) Montgomery digit columns.

    Each doubling multiplies the WHOLE current table by two shared scalars
    (r_i and 1-r_i) — exactly the MXU banded-matmul shape (`ops/mxu_mul`);
    the wide late steps (which carry ~all the work) take that path when
    enabled, the narrow early steps stay on the VPU CIOS kernel."""
    from ..utils.config import get_config

    use_mxu = get_config().use_mxu_fold()
    eq = jnp.asarray(L.mont_scalar(1))  # (16, 1)
    for i in range(k):
        if use_mxu and eq.shape[1] >= MXU_MIN_LANES:
            from .mxu_mul import mont_mul_scalar_mxu

            lo = mont_mul_scalar_mxu(eq, omr_pts[i][:, 0])
            hi = mont_mul_scalar_mxu(eq, r_pts[i][:, 0])
        else:
            lo = LJ.mont_mul(eq, omr_pts[i])
            hi = LJ.mont_mul(eq, r_pts[i])
        eq = jnp.concatenate([lo, hi], axis=1)  # (16, 2^(i+1))
    return eq


def _eq_table_sharded(r_pts, omr_pts, k: int, axis_name: str):
    """`_eq_table` with the doubling work split across a shard_map axis
    (VERDICT round-2 #6: the full-table build ran REPLICATED on every
    shard). eq factors as kron(eq_hi, eq_lo) over the top sigma / low
    k-sigma variable bits; shard s builds eq_lo (k-sigma doublings, 1/S of
    the lanes) and scales it by ITS scalar eq_hi[s] (sigma scalar
    multiplies), then one all_gather — concatenating along the top-bit
    order, which IS shard order — replicates the full (16, 2^k) table."""
    import jax

    S = jax.lax.axis_size(axis_name)
    sigma = S.bit_length() - 1
    # the kron(eq_hi, eq_lo) split assumes shard order == top-bit order, i.e.
    # power-of-two S; fall back to the replicated build otherwise rather than
    # silently producing a wrong-sized table
    if sigma == 0 or k < sigma or S & (S - 1) != 0:
        return _eq_table(r_pts, omr_pts, k)
    eq_lo = _eq_table(r_pts, omr_pts, k - sigma)  # (16, 2^(k-sigma))
    sid = jax.lax.axis_index(axis_name)
    hi_scalar = jnp.asarray(L.mont_scalar(1))  # (16, 1)
    for i in range(sigma):
        bit = (sid >> i) & 1  # top bits, low-first: variable k - sigma + i
        pick = jnp.where(bit == 1, r_pts[k - sigma + i], omr_pts[k - sigma + i])
        hi_scalar = LJ.mont_mul(hi_scalar, pick)
    my_slice = LJ.mont_mul(eq_lo, hi_scalar)
    return jax.lax.all_gather(my_slice, axis_name, axis=1, tiled=True)


def _finish_segment_sums(slo, shi):
    """(16, S) 8-bit-split sums (< 2^(8+log2 nnz)) -> strict reduced mod p."""
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


def _segment_reduce_mod_p(vals, seg_ids, num_segments: int):
    """Scatter-based segment reduction (exact; kept for the host-wrapper
    path). Random-index scatter serializes on TPU — the prove path uses
    `_segment_reduce_sorted` with a cached sort permutation instead."""
    lo = (vals & 0xFF).astype(jnp.uint32)
    hi = (vals >> 8).astype(jnp.uint32)
    rows = jnp.concatenate([lo, hi], axis=0)  # (32, nnz), each < 2^8
    sums = jax.ops.segment_sum(rows.T, seg_ids, num_segments=num_segments).T
    return _finish_segment_sums(sums[:NUM_DIGITS], sums[NUM_DIGITS:])


def _finish_segment_sums16(s):
    """(16, S) UNSPLIT u32 digit sums (each < 2^32: 16-bit digits summed
    over <= 2^16 colliding entries) -> strict reduced mod p. Splits AFTER
    the reduction — carries < 2^16 ride into the next digit."""
    zero = jnp.zeros_like(s[0])
    relaxed = []
    for d in range(NUM_DIGITS + 1):
        r = zero
        if d < NUM_DIGITS:
            r = r + (s[d] & 0xFFFF)
        if d >= 1:
            r = r + (s[d - 1] >> 16)
        relaxed.append(r)  # < 2^17
    pad = LJ.WIDE_DIGITS - len(relaxed)
    strict, _ = LJ._chain(relaxed + [zero] * pad)
    return LJ.reduce_wide(jnp.stack(strict))


def _segment_reduce_sorted(vals, perm, last_pos, split8: bool = True):
    """Exact segment reduction without any scatter: gather entries into
    segment-sorted order (`perm`, precomputed host-side from the indices
    alone — challenge-independent, cached on the SparseMLE; pass None when
    `vals` is ALREADY segment-sorted — an arbitrary-index gather costs
    ~3.2 ms at 2^18 entries on the v5e, 50x a monotone one, so the prove
    path pre-sorts entries host-side instead), prefix-sum along entries,
    and difference the cumsum at each segment's last position (`last_pos`,
    -1 for the all-empty prefix).

    Digit-split width (the init's bandwidth knob — round-4 verdict #1):
    - split8=True: 8-bit split -> 32 cumsum/gather rows; exact whenever a
      single segment's TRUE sum stays < 2^32, i.e. up to 2^24 colliding
      entries (u32 cumsum wraparound cancels in the difference).
    - split8=False: NO split -> 16 rows, HALF the cumsum + at-last-gather
      bytes; exact up to 2^16 colliding entries per segment. The caller
      picks per-axis from host-side segment counts (`_seg_narrow`) — the
      reference bench's random f1 has max collisions ~O(1).
    Either way the sums are exact integers, so proof bytes are identical.
    Replaces a 2^20-point random scatter (~0.3 s serialized on TPU) with a
    gather + log-depth scan (~ms)."""
    v = vals if perm is None else jnp.take(vals, perm, axis=1)
    if split8:
        lo = (v & 0xFF).astype(jnp.uint32)
        hi = (v >> 8).astype(jnp.uint32)
        rows = jnp.concatenate([lo, hi], axis=0)  # (32, nnz)
    else:
        rows = v  # (16, nnz), digits < 2^16
    csum = jnp.cumsum(rows, axis=1, dtype=jnp.uint32)
    at_last = jnp.take(csum, jnp.maximum(last_pos, 0), axis=1)
    at_last = jnp.where(last_pos[None, :] >= 0, at_last, 0)
    prev = jnp.concatenate(
        [jnp.zeros((rows.shape[0], 1), jnp.uint32), at_last[:, :-1]], axis=1
    )
    sums = at_last - prev  # exact: u32 wraparound cancels in the difference
    if split8:
        return _finish_segment_sums(sums[:NUM_DIGITS], sums[NUM_DIGITS:])
    return _finish_segment_sums16(sums)


def _mxu_key() -> str:
    """Current MXU mode, for keying trace-time-config-dependent caches."""
    from ..utils.config import get_config

    return get_config().mxu_mode()


@functools.lru_cache(maxsize=None)
def _compiled_phase1(nnz: int, dim: int, mxu: str = "off",
                     split8x: bool = True):
    def fn(gbits, perm_x, last_x, y_rev, values, g_r, g_omr, f3_bitrev):
        # entries arrive pre-sorted by x (`_split_f1_device`), so the
        # segment reduce skips its gather; perm_x rides along unused to
        # keep the split-tuple shape stable for the batch/stack callers.
        # Inits are gather-bound, so their multiplies trace with a small
        # CIOS body (4x the compile speed, ~nil warm cost — see
        # `cios_trace_mode`).
        with cios_trace_mode("fori4"):
            w = _weight_fold(gbits, values, g_r, g_omr, dim, sorted_idx=True)
            f3y = jnp.take(f3_bitrev, y_rev, axis=1)  # (16, nnz): f3[y]
            wv = LJ.mont_mul(w, f3y)
            hg = _segment_reduce_sorted(wv, None, last_x, split8x)
        return hg, w

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _compiled_phase2(nnz: int, dim: int, mxu: str = "off",
                     split8y: bool = True):
    def fn(x, perm_y, last_y, w, u_r, u_omr):
        with cios_trace_mode("fori4"):
            w2 = _weight_fold(x, w, u_r, u_omr, dim)
            return _segment_reduce_sorted(w2, perm_y, last_y, split8y)

    return jax.jit(fn)


def phase1_init_device_arrays(f1, f3, g: list[Fr], dim: int):
    """Device h_g + fixed-f1 entries, as device handles (no sync). Returns
    (h_g (16, 2^dim) jax array in BITREV lane order — `_split_f1_device`
    rev-sorts segments so no device-side bitrev pass is needed; (x, y, w)
    arrays for phase 2).

    Full indices can exceed int32 (3*dim bits); they are pre-split host-side
    into the g-bits (low dim), x (middle dim) and y (top dim) components,
    each < 2^dim. f3 is consumed through its cached bit-reversed device copy
    (the y gather indices are bit-reversed host-side to compensate)."""
    gbits_d, x_dev, yrev_d, vals_d, perm_x, last_x, perm_y, last_y = (
        _split_f1_device(f1, dim)
    )
    _nx, ny = _seg_narrow(f1)
    g_r, g_omr = _points_arrays(g)
    nx, _ny = _seg_narrow(f1)
    fn = _compiled_phase1(int(vals_d.shape[1]), dim, _mxu_key(), not nx)
    hg, w = fn(
        gbits_d,
        perm_x,
        last_x,
        yrev_d,
        vals_d,
        jnp.asarray(g_r),
        jnp.asarray(g_omr),
        f3.device_bitrev(),
    )
    return hg, (x_dev, perm_y, last_y, w, ny)


def _split_f1_device(f1, dim: int):
    """Device copies of f1's split index components + values, cached on the
    (immutable) SparseMLE so repeated proves never re-upload."""
    from ..protocol.prover import bitrev_perm

    cache = getattr(f1, "_dev_split", None)
    if cache is not None and cache[0] == dim:
        return cache[1]
    idx = np.asarray(f1.indices).astype(np.int64)
    mask = (1 << dim) - 1
    revp = bitrev_perm(dim)
    # Pre-sort ALL entry arrays by the BIT-REVERSED x host-side
    # (challenge-independent, once per f1). Two devices gathers die at once:
    # (1) the phase-1 segment reduce needs NO entry gather (entries are
    # already segment-sorted; an arbitrary (16, 2^18) gather costs ~3 ms on
    # the v5e, a host argsort at upload is free), and (2) because the
    # segment ids are bitrev(x), h_g comes OUT of the reduce already in the
    # bitrev lane order the round chain wants — no `bitrev_cols` pass.
    # Segment sums are order-exact (integer adds): proof bytes unchanged.
    x_rev_vals = revp[((idx >> dim) & mask)].astype(np.int32)
    order = np.argsort(x_rev_vals, kind="stable")
    idx = idx[order]
    vals = np.asarray(f1.values)[:, order]
    gbits = (idx & mask).astype(np.int32)
    x = ((idx >> dim) & mask).astype(np.int32)  # natural values, rev-sorted
    y = (idx >> (2 * dim)).astype(np.int32)
    y_rev = revp[y].astype(np.int32)
    assert len(idx) <= 1 << 24, "cumsum exactness bound"

    narrow = {}

    def sort_meta(seg, axis):
        """Segment metadata over BITREV segment ids: `perm` re-sorts entries
        by bitrev(seg); `last` = last sorted position per bitrev id. Also
        records whether the 16-row (no-split) segment reduce is exact for
        this axis: max entries per segment <= 2^16 (`_segment_reduce_sorted`
        split8 docstring)."""
        perm = np.argsort(seg, kind="stable").astype(np.int32)
        srt = seg[perm]
        last = (np.searchsorted(srt, np.arange(1 << dim), side="right") - 1)
        narrow[axis] = bool(np.bincount(seg, minlength=1).max() <= (1 << 16))
        return perm, last.astype(np.int32)

    # perm_x is the identity by construction; kept in the tuple (the batch
    # prover stacks all 8 slots) but unused by the phase-1 reduce
    perm_x, last_x = sort_meta(x_rev_vals[order], "x")
    perm_y, last_y = sort_meta(y_rev, "y")
    out = (
        jnp.asarray(gbits),
        jnp.asarray(x),
        jnp.asarray(y_rev),
        jnp.asarray(vals),
        jnp.asarray(perm_x),
        jnp.asarray(last_x),
        jnp.asarray(perm_y),
        jnp.asarray(last_y),
    )
    try:
        f1._dev_split = (dim, out)
        f1._seg_narrow = (narrow["x"], narrow["y"])
    except AttributeError:
        pass  # slotted stand-ins (host wrapper) just skip the cache
    return out


def _seg_narrow(f1) -> tuple[bool, bool]:
    """(x-axis, y-axis) 16-row-reduce eligibility recorded at split time;
    (False, False) — the always-exact 8-bit split — when unknown."""
    return getattr(f1, "_seg_narrow", (False, False))


def phase1_init_device(f1_indices, f1_values, f3_evals, g: list[Fr], dim: int):
    """Host-facing wrapper: h_g as a NumPy array (see arrays variant)."""

    class _F1:
        indices, values = f1_indices, f1_values

    class _F3:
        @staticmethod
        def device_bitrev():
            from ..protocol.prover import to_bitrev

            return jnp.asarray(to_bitrev(f3_evals, dim))

    hg, carry = phase1_init_device_arrays(_F1, _F3, g, dim)
    # the device reduce emits bitrev lane order (rev-sorted segments);
    # host consumers want natural order
    from ..protocol.prover import bitrev_perm

    return np.asarray(hg)[:, bitrev_perm(dim)], carry


def phase2_init_device(carry, u: list[Fr], dim: int) -> np.ndarray:
    """Device f1(g, u, .) densified: (16, 2^dim) strict, natural order."""
    from ..protocol.prover import bitrev_perm

    x, perm_y, last_y, w, narrow_y = carry
    u_r, u_omr = _points_arrays(u)
    fn = _compiled_phase2(int(x.shape[0]), dim, _mxu_key(), not narrow_y)
    out = np.asarray(
        fn(x, perm_y, last_y, w, jnp.asarray(u_r), jnp.asarray(u_omr))
    )
    return out[:, bitrev_perm(dim)]  # device emits bitrev lane order


# ---------------------------------------------------------------------------
# chained-GKR helpers: everything below stays on device (no host syncs)
# ---------------------------------------------------------------------------


def bitrev_cols(x, nv: int):
    """(16, 2^nv) natural order -> bit-reversed, in-trace (iota bit math —
    no captured permutation constants).

    Note: a reshape + 18-axis transpose formulation measured FASTER
    standalone (0.76 vs 2.87 ms at 2^18 lanes) but 9 ms SLOWER inside the
    fused phase-init programs (it wrecks XLA's surrounding fusions), so the
    take stays. The hot GKR path avoids this op entirely: `_split_f1_device`
    sorts entries by BIT-REVERSED segment ids, so the phase tables come out
    of the segment reduce already in bitrev lane order."""
    i = jax.lax.iota(jnp.int32, 1 << nv)
    rev = jnp.zeros_like(i)
    for b in range(nv):
        rev = rev | (((i >> b) & 1) << (nv - 1 - b))
    return jnp.take(x, rev, axis=1)


def _phase1_pair_body(dim: int, split8x: bool = True):
    """Fused phase-1 init + pair prep body: from (f1 components, g, f2, f3)
    to the phase-1 (lo, hi) pair plus the per-entry weights `w` (kept for
    phase 2). Merges `_compiled_phase1` and `_compiled_prep1` — through the
    tunnel every async dispatch costs ~2 ms. Pure jnp: jitted directly or
    vmapped over an instance axis (batched GKR)."""

    def fn(gbits, perm_x, last_x, y_rev, values, g_r, g_omr, f3_bitrev,
           f2_bitrev):
        # entries pre-sorted by x: no segment gather (see `_compiled_phase1`)
        with cios_trace_mode("fori4"):  # gather-bound: small CIOS trace
            w = _weight_fold(gbits, values, g_r, g_omr, dim, sorted_idx=True)
            f3y = jnp.take(f3_bitrev, y_rev, axis=1)
            wv = LJ.mont_mul(w, f3y)
            hg = _segment_reduce_sorted(wv, None, last_x, split8x)  # bitrev lane order
        n = 1 << dim
        s = jnp.stack([hg, f2_bitrev], axis=0)
        return s[:, :, : n // 2], s[:, :, n // 2 :], w

    return fn


def _phase2_pair_body(dim: int, split8y: bool = True):
    """Fused final-fold(f2(u)) + phase-2 init + pair prep body: from
    (phase-1 final pair + challenges, f1 components, f3) to the phase-2
    (lo, hi) pair. Merges `_compiled_final_fold`, `_compiled_phase2_digits`
    and `_compiled_prep2`."""

    def fn(pair_lo, pair_hi, r_last, x, perm_y, last_y, w, u_digits,
           f3_bitrev):
        with cios_trace_mode("fori4"):  # gather-bound: small CIOS trace
            l, h = pair_lo[1, :, 0], pair_hi[1, :, 0]
            f2u = LJ.add(l, LJ.mont_mul(LJ.sub(h, l), r_last))
            one = jnp.asarray(L.mont_scalar(1))
            r_pts = [u_digits[i][:, None] for i in range(dim)]
            omr_pts = [LJ.sub(one, r) for r in r_pts]
            w2 = _weight_fold(x, w, r_pts, omr_pts, dim)
            f1gu = _segment_reduce_sorted(w2, perm_y, last_y, split8y)  # bitrev order
        n = 1 << dim
        from ..utils.config import get_config

        if get_config().use_mxu_fold() and n >= MXU_MIN_LANES:
            from .mxu_mul import mont_mul_scalar_mxu

            f3f2u = mont_mul_scalar_mxu(f3_bitrev, f2u)
        else:
            f3f2u = LJ.mont_mul(f3_bitrev, f2u[:, None])
        s = jnp.stack([f1gu, f3f2u], axis=0)
        return s[:, :, : n // 2], s[:, :, n // 2 :]

    return fn


@functools.lru_cache(maxsize=None)
def _compiled_phase1_pair(nnz: int, dim: int, mxu: str = "off",
                          split8x: bool = True):
    return jax.jit(_phase1_pair_body(dim, split8x))


@functools.lru_cache(maxsize=None)
def _compiled_phase2_pair(nnz: int, dim: int, mxu: str = "off",
                          split8y: bool = True):
    return jax.jit(_phase2_pair_body(dim, split8y))


_warmed_pairs: set = set()


def warm_pair_programs_async(nnz: int, dim: int, mxu: str,
                             split8x: bool, split8y: bool) -> None:
    """Compile BOTH fused phase-init programs on background threads (cold
    path, VERDICT round-4 ask #4): each executes once on zero arrays of the
    exact production shapes/dtypes, populating the jit caches so the real
    calls are pure hits. Launched before the f1 split upload so all five
    GKR programs (two pair inits + first/fold/tail chain) compile
    CONCURRENTLY server-side instead of serializing at first use — the
    dummy executions themselves cost ~ms of device time on zeros."""
    import concurrent.futures

    if jax.default_backend() != "tpu":
        return None
    key = (nnz, dim, mxu, split8x, split8y)
    if key in _warmed_pairs:
        return None
    _warmed_pairs.add(key)
    z = jnp.zeros
    n = 1 << dim

    def p1():
        fn = _compiled_phase1_pair(nnz, dim, mxu, split8x)
        out = fn(
            z((nnz,), jnp.int32), z((nnz,), jnp.int32),
            z((n,), jnp.int32), z((nnz,), jnp.int32),
            z((NUM_DIGITS, nnz), jnp.uint32),
            z((dim, NUM_DIGITS, 1), jnp.uint32),
            z((dim, NUM_DIGITS, 1), jnp.uint32),
            z((NUM_DIGITS, n), jnp.uint32),
            z((NUM_DIGITS, n), jnp.uint32),
        )
        jax.block_until_ready(out)

    def p2():
        fn = _compiled_phase2_pair(nnz, dim, mxu, split8y)
        out = fn(
            z((2, NUM_DIGITS, 1), jnp.uint32), z((2, NUM_DIGITS, 1), jnp.uint32),
            z((NUM_DIGITS,), jnp.uint32),
            z((nnz,), jnp.int32), z((nnz,), jnp.int32), z((n,), jnp.int32),
            z((NUM_DIGITS, nnz), jnp.uint32),
            z((dim, NUM_DIGITS), jnp.uint32),
            z((NUM_DIGITS, n), jnp.uint32),
        )
        jax.block_until_ready(out)

    ex = concurrent.futures.ThreadPoolExecutor(2)
    futs = {"p1": ex.submit(p1), "p2": ex.submit(p2)}
    ex.shutdown(wait=False)
    # caller joins each future right before its real call: racing the warm
    # thread into the same jit would at best duplicate-wait, at worst
    # duplicate-compile on the (serialization-prone) compile service
    return futs


@functools.lru_cache(maxsize=None)
def _compiled_prep1(dim: int):
    """[h_g (BITREV lane order — `_split_f1_device` rev-sorts segments),
    f2 (bitrev)] -> the (lo, hi) pair for phase 1, slot axis leading
    ((2, 16, half) — see `round_pallas` layout note).
    (No ones slot: the single product h_g*f2 needs no ragged padding.)"""

    def fn(hg_brev, f2_bitrev):
        n = 1 << dim
        s = jnp.stack([hg_brev, f2_bitrev], axis=0)
        return s[:, :, : n // 2], s[:, :, n // 2 :]

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _compiled_final_fold(slot: int):
    """Fold the 1-lane final pair by the last challenge: table[slot](point)."""

    def fn(lo, hi, r):  # lo, hi (U, 16, 1); r (16,)
        l, h = lo[slot, :, 0], hi[slot, :, 0]
        return LJ.add(l, LJ.mont_mul(LJ.sub(h, l), r))

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _compiled_phase2_digits(nnz: int, dim: int, mxu: str = "off",
                            split8y: bool = True):
    """Phase-2 init from on-device challenge digits (Montgomery form)."""

    def fn(x, perm_y, last_y, w, u_digits):  # u_digits (dim, 16)
        with cios_trace_mode("fori4"):
            one = jnp.asarray(L.mont_scalar(1))  # (16, 1)
            r_pts = [u_digits[i][:, None] for i in range(dim)]
            omr_pts = [LJ.sub(one, r) for r in r_pts]
            w2 = _weight_fold(x, w, r_pts, omr_pts, dim)
            return _segment_reduce_sorted(w2, perm_y, last_y, split8y)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _compiled_prep2(dim: int, mxu: str = "off"):
    """[f1_gu (natural), f3 (bitrev), f2(u)] -> the phase-2 pair for
    `f1_gu * (f2(u) * f3)` (reference `mod.rs:66-82`)."""

    def fn(f1gu_brev, f3_bitrev, f2u):
        n = 1 << dim
        from ..utils.config import get_config

        if get_config().use_mxu_fold() and n >= MXU_MIN_LANES:
            from .mxu_mul import mont_mul_scalar_mxu

            f3f2u = mont_mul_scalar_mxu(f3_bitrev, f2u)  # shared-scalar MXU
        else:
            f3f2u = LJ.mont_mul(f3_bitrev, f2u[:, None])
        s = jnp.stack([f1gu_brev, f3f2u], axis=0)
        return s[:, :, : n // 2], s[:, :, n // 2 :]

    return jax.jit(fn)
