"""Chained mesh-sharded GKR round sumcheck: ONE host synchronization per prove.

Sharded analog of `gkr_round_sumcheck._prove_chained` (reference
`src/gkr_round_sumcheck/mod.rs:93-139`), built from the same pieces as the
chained sharded MLSumcheck prover (`parallel/chained.py`):

- **Phase inits, sharded by nonzeros.** f1's nnz entries are split into S
  contiguous chunks (zero-padded — Montgomery 0 contributes nothing to any
  segment sum). Each shard runs the weight fold + gather + local sorted
  segment reduction (`ops/gkr_init`) over ITS chunk, producing a per-shard
  partial dense table (16, 2^dim) of strict digits; one exact uint32
  `lax.psum` + wide reduction mod p replicates the full h_g / f1_gu on every
  shard. Per-chunk sort metadata is challenge-independent and cached on the
  SparseMLE. Init compute scales 1/S; communication is one table allreduce
  per phase.
- **Rounds through the sharded generic engine.** The replicated dense tables
  are bit-reversed, paired, and dealt cyclically (mod S, on device — each
  shard slices its own lanes), then both dim-round degree-2 sumchecks run
  through `chained.py`'s `_sharded_step`/`_sharded_chain` (per-round exact
  psum of the (WIDE, d+1) partials, replicated device transcript) with the
  same gathered replicated tail.
- The transcript feeds ONLY prover messages (reference `mod.rs:114,128` — no
  domain separation), and the host fetches everything once at the end.

Proofs are byte-identical to the host path across any shard count
(`tests/test_sharded_gkr.py`).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.fr import NUM_DIGITS
from ..protocol.device_prover import (
    lift_transcript,
    msgs_from_host,
    restore_transcript,
)
from ..protocol.generic_prover import _chain_step, _fetch
from ..utils.errors import SumcheckError
from .chained import _gather_remnant, _sharded_chain, _sharded_step
from .mesh import default_mesh

_PRODUCTS = ((0, 1),)  # h_g*f2 and f1_gu*(f2(u)*f3): one 2-slot unit product
_DEGREE = 2


def _psum_reduce_mod_p(part, axis_name: str):
    """Exact cross-shard sum of strict (16, n) Montgomery digit tables:
    reduce_scatter (digits < S*2^16 in u32 — exact far beyond any real
    mesh), SHARD-LOCAL carry normalization + wide reduction mod p of the
    1/S chunk, then all_gather of the strict chunks. Same bytes on the
    wire as a plain psum (that is how psum decomposes) but the mod-p
    reduction work — previously replicated on every shard (VERDICT
    round-2 #6) — now splits 1/S."""
    import jax
    import jax.numpy as jnp

    from ..fields import limbs_jnp as LJ

    n = part.shape[1]
    S = jax.lax.axis_size(axis_name)
    if n % S:
        acc = jax.lax.psum(part, axis_name)
        pad = [jnp.zeros_like(acc[0])] * (LJ.WIDE_DIGITS - NUM_DIGITS)
        strict, _ = LJ._chain([acc[i] for i in range(NUM_DIGITS)] + pad)
        return LJ.reduce_wide(jnp.stack(strict))
    acc = jax.lax.psum_scatter(part, axis_name, scatter_dimension=1, tiled=True)
    pad = [jnp.zeros_like(acc[0])] * (LJ.WIDE_DIGITS - NUM_DIGITS)
    strict, _ = LJ._chain([acc[i] for i in range(NUM_DIGITS)] + pad)
    chunk = LJ.reduce_wide(jnp.stack(strict))  # (16, n/S) strict
    return jax.lax.all_gather(chunk, axis_name, axis=1, tiled=True)


@functools.lru_cache(maxsize=None)
def _phase1_init_sharded(mesh, chunk: int, dim: int, mxu: str = "off"):
    """Per-shard phase-1 init (reference `mod.rs:22-42`, sharded): local
    weight fold + f3 gather + local segment reduction, psum'd to the
    replicated dense h_g. Also returns the shard-local fixed-f1 weights `w`
    (kept sharded for phase 2)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    from ..fields import limbs_jnp as LJ
    from ..ops import gkr_init as GI

    def fn(gbits, y_rev, values, perm_x, last_x, g_r, g_omr, f3_bitrev):
        w = GI._weight_fold(gbits, values, g_r, g_omr, dim, axis_name="x")
        f3y = jnp.take(f3_bitrev, y_rev, axis=1)
        wv = LJ.mont_mul(w, f3y)
        part = GI._segment_reduce_sorted(wv, perm_x, last_x[0])
        return _psum_reduce_mod_p(part, "x"), w

    sh1 = Pspec("x")
    sh2 = Pspec(None, "x")
    rep = Pspec()
    wrapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(sh1, sh1, sh2, sh1, Pspec("x", None), rep, rep, rep),
        out_specs=(rep, sh2),
        check_vma=False,
    )
    return jax.jit(wrapped)


@functools.lru_cache(maxsize=None)
def _phase2_init_sharded(mesh, chunk: int, dim: int, mxu: str = "off"):
    """Per-shard phase-2 init (reference `mod.rs:57-63`, sharded) from the
    on-device phase-1 challenge digits: local weight fold over the x bits of
    each shard's nonzeros, local segment reduction over y, psum'd to the
    replicated dense f1(g, u, .)."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    import jax.numpy as jnp

    from ..fields import limbs_jnp as LJ
    from ..fields import limbs_np as L
    from ..ops import gkr_init as GI

    def fn(x, perm_y, last_y, w, u_digits):  # u_digits (dim, 16) Montgomery
        one = jnp.asarray(L.mont_scalar(1))
        r_pts = [u_digits[i][:, None] for i in range(dim)]
        omr_pts = [LJ.sub(one, r) for r in r_pts]
        w2 = GI._weight_fold(x, w, r_pts, omr_pts, dim, axis_name="x")
        part = GI._segment_reduce_sorted(w2, perm_y, last_y[0])
        return _psum_reduce_mod_p(part, "x")

    sh1 = Pspec("x")
    wrapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(sh1, sh1, Pspec("x", None), Pspec(None, "x"), Pspec()),
        out_specs=Pspec(),
        check_vma=False,
    )
    return jax.jit(wrapped)


@functools.lru_cache(maxsize=None)
def _prep_deal(mesh, dim: int, S: int, scaled: bool, mxu: str = "off"):
    """Replicated dense table(s) -> each shard's cyclically-dealt local pair
    stripes, entirely on device. `scaled` builds the phase-2 second slot
    `f2(u) * f3` (reference `mod.rs:66-82`); otherwise slot 1 is f2 as-is.
    Local lane l on shard s holds global (bit-reversed) pair lane l*S + s —
    the same deal as `chained.py._init_sharded_pair`, so the unmodified
    sharded round programs run on the result."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    from ..fields import limbs_jnp as LJ
    from ..ops import gkr_init as GI

    n = 1 << dim
    H_loc = (n // 2) // S

    def _rev(idx):
        # in-trace bit reversal of dim-bit indices (no captured constants)
        rev = jnp.zeros_like(idx)
        for b in range(dim):
            rev = rev | (((idx >> b) & 1) << (dim - 1 - b))
        return rev

    def fn(main_nat, other_bitrev, f2u):
        # gather ONLY this shard's dealt lanes (2*H_loc of n) — building the
        # full bit-reversed stack and slicing afterwards ran the bitrev
        # gather and the f2(u) scaling replicated on every shard (VERDICT
        # round-2 #6); now both are 1/S
        sid = jax.lax.axis_index("x").astype(jnp.int32)
        idx = jax.lax.iota(jnp.int32, H_loc) * S + sid  # global pair lane
        both = jnp.concatenate([idx, idx + n // 2])  # bit-reversed positions
        main = jnp.take(main_nat, _rev(both), axis=1)  # (16, 2*H_loc)
        other = jnp.take(other_bitrev, both, axis=1)
        if scaled:
            from ..utils.config import get_config

            if get_config().use_mxu_fold() and 2 * H_loc >= GI.MXU_MIN_LANES:
                from ..ops.mxu_mul import mont_mul_scalar_mxu

                other = mont_mul_scalar_mxu(other, f2u)
            else:
                other = LJ.mont_mul(other, f2u[:, None])
        s = jnp.stack([main, other], axis=0)  # (2, 16, 2*H_loc)
        return s[:, :, :H_loc], s[:, :, H_loc:]

    rep = Pspec()
    spec_t = Pspec(None, None, "x")
    wrapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(rep, rep, rep),
        out_specs=(spec_t, spec_t),
        check_vma=False,
    )
    return jax.jit(wrapped)


def _split_f1_sharded(f1, dim: int, S: int, mesh):
    """Host-side, challenge-independent shard metadata for f1, cached on the
    (immutable) SparseMLE: indices split into g/x/y bit components, entries
    zero-padded to S equal chunks, and PER-CHUNK segment-sort metadata for
    both the x (phase 1) and y (phase 2) groupings. Arrays are materialized
    per-process (`make_array_from_callback`) with their shard_map shardings,
    so the same code path serves `jax.distributed` multi-host meshes."""
    from ..protocol.prover import bitrev_perm

    cache = getattr(f1, "_shard_split", None)
    if cache is not None and cache[0] == (dim, S, mesh):
        return cache[1]

    idx = np.asarray(f1.indices).astype(np.int64)
    vals = np.asarray(f1.values)
    nnz = len(idx)
    chunk = max(1, -(-nnz // S))
    pad = S * chunk - nnz
    if pad:
        idx = np.concatenate([idx, np.zeros(pad, np.int64)])
        vals = np.concatenate(
            [vals, np.zeros((NUM_DIGITS, pad), vals.dtype)], axis=1
        )
    mask = (1 << dim) - 1
    gbits = (idx & mask).astype(np.int32)
    x = ((idx >> dim) & mask).astype(np.int32)
    y = (idx >> (2 * dim)).astype(np.int32)
    y_rev = bitrev_perm(dim)[y].astype(np.int32)
    assert chunk <= 1 << 24, "per-shard cumsum exactness bound"

    def chunk_meta(seg):
        perms, lasts = [], []
        for c in range(S):
            loc = seg[c * chunk : (c + 1) * chunk]
            perm = np.argsort(loc, kind="stable").astype(np.int32)
            srt = loc[perm]
            last = np.searchsorted(srt, np.arange(1 << dim), side="right") - 1
            perms.append(perm)
            lasts.append(last.astype(np.int32))
        return np.concatenate(perms), np.stack(lasts)

    perm_x, last_x = chunk_meta(x)
    perm_y, last_y = chunk_meta(y)

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    def _mk(arr, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda i: arr[i]
        )

    e = Pspec("x")  # entry axis
    out = (
        _mk(gbits, e),
        _mk(x, e),
        _mk(y_rev, e),
        _mk(vals, Pspec(None, "x")),
        _mk(perm_x, e),
        _mk(last_x, Pspec("x", None)),
        _mk(perm_y, e),
        _mk(last_y, Pspec("x", None)),
    )
    try:
        f1._shard_split = ((dim, S, mesh), out)
    except AttributeError:
        pass
    return out


class ShardedGKRProver:
    """Mesh-sharded GKR round sumcheck prove, byte-identical to
    `GKRRoundSumcheck.prove`, with the Fiat-Shamir transcript replicated on
    device and a single host synchronization."""

    def __init__(self, mesh=None, block: int | None = None):
        self.mesh = mesh if mesh is not None else default_mesh()
        self.num_shards = int(
            np.prod([self.mesh.shape[a] for a in self.mesh.axis_names])
        )
        assert self.num_shards & (self.num_shards - 1) == 0
        self.block = block

    @staticmethod
    def auto(num_devices: int | None = None) -> "ShardedGKRProver":
        return ShardedGKRProver(default_mesh(num_devices))

    def prove(self, rng, f1, f2, f3, g):
        """Caller supplies the transcript RNG (reference `mod.rs:93-139`)."""
        import jax.numpy as jnp

        from ..gkr_round_sumcheck import GKRProof
        from ..ops import gkr_init as GI
        from ..utils.config import get_config

        assert f1.num_vars == 3 * f2.num_vars
        assert f1.num_vars == 3 * f3.num_vars
        dim = f2.num_vars
        S = self.num_shards
        H = 1 << (dim - 1)
        if H < S:
            raise SumcheckError(
                f"GKR dim {dim} cannot be sharded over {S} devices"
            )
        (gbits, x, y_rev, vals, perm_x, last_x, perm_y, last_y) = (
            _split_f1_sharded(f1, dim, S, self.mesh)
        )
        chunk = int(gbits.shape[0]) // S
        g_r, g_omr = GI._points_arrays(list(g))
        f3_bitrev = f3.device_bitrev()

        mxu = GI._mxu_key()
        hg, w = _phase1_init_sharded(self.mesh, chunk, dim, mxu)(
            gbits, y_rev, vals, perm_x, last_x,
            jnp.asarray(g_r), jnp.asarray(g_omr), f3_bitrev,
        )
        lo, hi = _prep_deal(self.mesh, dim, S, False, mxu)(
            hg, f2.device_bitrev(), jnp.zeros((NUM_DIGITS,), jnp.uint32)
        )

        ts = lift_transcript(rng)
        state = (ts.h, ts.t, ts.buf, jnp.uint32(ts.blen))
        B = min(self.block or get_config().generic_block, H // S)
        r0 = jnp.zeros((NUM_DIGITS,), jnp.uint32)

        lo, hi, r, state, parts1 = self._run_phase(lo, hi, dim, B, r0, state)
        rs1 = jnp.concatenate([rs[:n] for _m, rs, n in parts1], axis=0)

        # f2(u): one more fold of the 1-lane final pair by the last challenge
        f2_u = GI._compiled_final_fold(1)(lo[:, :, :1], hi[:, :, :1], r)

        f1_gu = _phase2_init_sharded(self.mesh, chunk, dim, mxu)(
            x, perm_y, last_y, w, rs1
        )
        lo, hi = _prep_deal(self.mesh, dim, S, True, mxu)(f1_gu, f3_bitrev, f2_u)
        lo, hi, r, state, parts2 = self._run_phase(lo, hi, dim, B, r, state)

        msgs_h, _rs_h, carry_h, blen = _fetch(parts1 + parts2, state, _DEGREE)
        restore_transcript(rng, carry_h, blen)
        return GKRProof(
            msgs_from_host(msgs_h[:dim], _DEGREE),
            msgs_from_host(msgs_h[dim:], _DEGREE),
        )

    def _run_phase(self, lo, hi, dim: int, B: int, r, state):
        """One dim-round degree-2 sumcheck over the dealt local pair: sharded
        first round + sharded chain + gathered replicated tail (the exact
        stage structure of `chained.py.prove_as_subprotocol`)."""
        import jax.numpy as jnp

        from ..utils.config import get_config

        S = self.num_shards
        sigma = S.bit_length() - 1
        H_loc = (1 << (dim - 1)) // S
        num_sharded = dim - sigma
        parts = []

        step = _sharded_step(
            self.mesh, H_loc, 2, _PRODUCTS, _DEGREE, B, "first_block"
        )
        lo, hi, r, state, canon = step(lo, hi, jnp.uint32(H_loc), r, *state)
        parts.append((canon[None], r[None], 1))

        if num_sharded > 1:
            cstep = _sharded_chain(
                self.mesh, H_loc, 2, _PRODUCTS, _DEGREE, B
            )
            lo, hi, r, state, msgs, rs = cstep(
                lo, hi, jnp.uint32(H_loc >> 1), jnp.int32(num_sharded - 1),
                r, *state
            )
            parts.append((msgs, rs, num_sharded - 1))

        if sigma:
            lo, hi = _gather_remnant(self.mesh, 2)(lo, hi)
            Bt = min(self.block or get_config().generic_block, S)
            cstep = _chain_step(S, 2, _PRODUCTS, _DEGREE, Bt, False)
            lo, hi, r, state, msgs, rs = cstep(
                lo, hi, jnp.uint32(S >> 1), jnp.int32(sigma), r, *state
            )
            parts.append((msgs, rs, sigma))
        return lo, hi, r, state, parts
