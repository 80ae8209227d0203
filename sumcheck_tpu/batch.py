"""Batched (throughput-mode) MLSumcheck: prove many independent instances of
the same shape in one fused device computation per round.

BASELINE.json config 4: "many independent nv=16 instances packed per chip".
The reference has no analog — it proves one instance per call; here the round
engine's batch axis (`protocol/engine.py`) packs B instances into every limb
op, and only the (host-side, microsecond) transcripts stay per-instance.
Proofs are bit-identical to proving each instance alone with `MLSumcheck`.

Instances must share (num_variables, product index structure, degree);
coefficients and table contents vary freely.
"""

from __future__ import annotations

import functools

import numpy as np

from .data_structures import ListOfProductsOfPolynomials
from .fields import limbs_np as L
from .fields.fr import Fr, NUM_DIGITS, P, R_INV
from .fields import limbs_jnp as LJ
from .ml_sumcheck import MLSumcheck
from .protocol import engine
from .protocol.prover import ProverMsg, to_bitrev
from .transcript.blake2b_rng import Blake2b512Rng
from .utils.config import get_config
from .utils.errors import SumcheckError


@functools.lru_cache(maxsize=None)
def _compiled_batched_round(n, batch, num_products, max_len, degree, num_slots, do_fold):
    import jax

    def fn(stacked, coeffs, idx_mat, r_cols):
        if do_fold:
            stacked = engine.fold_tables(engine.DEVICE, stacked, r_cols)
        sums = engine.round_sums(engine.DEVICE, stacked, coeffs, idx_mat, degree)
        return (stacked if do_fold else None), sums

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# chained batched path: B transcripts advance on device in lockstep (vmapped
# Blake2b + rejection sampling), all nv rounds enqueue without a host sync
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# generic-chain batched path: vmap the shape-generic round/chain programs over
# the instance axis — 3 compiled programs for ANY nv (vs one per table size),
# one dispatch per program, one host sync for all B proofs. The vmapped
# rejection-sampling while_loop is exact: converged instances hold their
# state while stragglers retry.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _bstep_generic(H: int, U: int, products: tuple, degree: int, block: int,
                   variant: str):
    import jax

    from .protocol.generic_prover import _generic_step

    raw = _generic_step.__wrapped__(
        H, U, products, degree, block, variant, False, jit=False
    )
    vfn = jax.vmap(raw, in_axes=(0, 0, None, 0, 0, 0, 0, 0))
    return jax.jit(vfn, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=None)
def _bchain_generic(H: int, U: int, products: tuple, degree: int, block: int):
    import jax

    from .protocol.generic_prover import _chain_step

    raw = _chain_step.__wrapped__(
        H, U, products, degree, block, False, jit=False
    )
    vfn = jax.vmap(raw, in_axes=(0, 0, None, None, 0, 0, 0, 0, 0))
    return jax.jit(vfn, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=None)
def _bstep_generic_sharded(mesh, H: int, U: int, products: tuple, degree: int,
                           block: int, variant: str):
    """`_bstep_generic` with the instance axis sharded over the mesh: pure
    data parallelism (each device proves its local instances through the
    same generic program; no collectives — the instances are independent)."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    from .protocol.generic_prover import _generic_step

    raw = _generic_step.__wrapped__(
        H, U, products, degree, block, variant, False, jit=False
    )
    vfn = jax.vmap(raw, in_axes=(0, 0, None, 0, 0, 0, 0, 0))
    sh = Pspec("x")
    fn = shard_map(
        vfn, mesh=mesh,
        in_specs=(sh, sh, Pspec(), sh, sh, sh, sh, sh),
        out_specs=(sh, sh, sh, (sh, sh, sh, sh), sh),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=None)
def _bchain_generic_sharded(mesh, H: int, U: int, products: tuple,
                            degree: int, block: int):
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    from .protocol.generic_prover import _chain_step

    raw = _chain_step.__wrapped__(
        H, U, products, degree, block, False, jit=False
    )
    vfn = jax.vmap(raw, in_axes=(0, 0, None, None, 0, 0, 0, 0, 0))
    sh = Pspec("x")
    fn = shard_map(
        vfn, mesh=mesh,
        in_specs=(sh, sh, Pspec(), Pspec(), sh, sh, sh, sh, sh),
        out_specs=(sh, sh, sh, (sh, sh, sh, sh), sh, sh),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0, 1))


_bpacker = None


def _bpack(parts, state):
    global _bpacker
    import jax
    import jax.numpy as jnp

    if _bpacker is None:
        def pack(arrs, st):
            flats = [a.reshape(-1) for a in arrs] + [x.reshape(-1) for x in st]
            return jnp.concatenate(flats)

        _bpacker = jax.jit(pack)
    arrs = []
    for m, rr, _n in parts:
        arrs.append(m)
        arrs.append(rr)
    return _bpacker(tuple(arrs), state)


def _prove_batched_generic(fs_rngs, polynomials, degree: int, nv: int,
                           mesh=None):
    import jax.numpy as jnp

    from .protocol.device_prover import (
        col_int,
        init_pair,
        lift_transcript,
        msgs_from_host,
    )

    pairs = [init_pair(p) for p in polynomials]
    products = pairs[0][2]
    lo = jnp.stack([p[0] for p in pairs])  # (B, U, 16, H0) — stack copies,
    hi = jnp.stack([p[1] for p in pairs])  # so cached pairs stay intact
    Bn = lo.shape[0]
    H0 = lo.shape[3]
    target = get_config().generic_pad_lanes()
    if target and H0 < target:
        padw = ((0, 0), (0, 0), (0, 0), (0, target - H0))
        lo, hi = jnp.pad(lo, padw), jnp.pad(hi, padw)
    H = lo.shape[3]
    U = lo.shape[1]
    Blk = min(get_config().batch_block, H)

    lifted = [lift_transcript(r) for r in fs_rngs]
    blen0 = lifted[0].blen
    assert all(t.blen == blen0 for t in lifted)
    state = (
        jnp.stack([t.h for t in lifted]),
        jnp.stack([t.t for t in lifted]),
        jnp.stack([t.buf for t in lifted]),
        jnp.full((Bn,), blen0, jnp.uint32),
    )
    r = jnp.zeros((Bn, NUM_DIGITS), jnp.uint32)
    parts = []

    if mesh is not None:
        # materialize per-process with the instance-axis sharding (a plain
        # committed array cannot be resharded onto a mesh with
        # non-addressable devices — multi-host pods, as in parallel/chained)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        sharding = NamedSharding(mesh, Pspec("x"))

        def _mk(arr):
            a = np.asarray(arr)
            return jax.make_array_from_callback(
                a.shape, sharding, lambda i: a[i]
            )

        lo, hi, r = _mk(lo), _mk(hi), _mk(r)
        state = tuple(_mk(s) for s in state)
        step = _bstep_generic_sharded(
            mesh, H, U, products, degree, Blk, "first_block"
        )
    else:
        step = _bstep_generic(H, U, products, degree, Blk, "first_block")
    lo, hi, r, state, canon = step(lo, hi, jnp.uint32(H0), r, *state)
    parts.append((canon[:, None], r[:, None], 1))

    if nv > 1:
        if mesh is not None:
            cstep = _bchain_generic_sharded(mesh, H, U, products, degree, Blk)
        else:
            cstep = _bchain_generic(H, U, products, degree, Blk)
        lo, hi, r, state, msgs, rs = cstep(
            lo, hi, jnp.uint32(H0 >> 1), jnp.int32(nv - 1), r, *state
        )
        parts.append((msgs, rs, nv - 1))

    flat = np.asarray(_bpack(parts, state))  # ONE host transfer for B proofs
    d1 = degree + 1
    off = 0
    msgs_np, rs_np = [], []
    for m, rr, n in parts:
        sz = int(np.prod(m.shape))
        msgs_np.append(flat[off : off + sz].reshape(m.shape)[:, :n])
        off += sz
        sz = int(np.prod(rr.shape))
        rs_np.append(flat[off : off + sz].reshape(rr.shape)[:, :n])
        off += sz
    msgs_all = np.concatenate(msgs_np, axis=1)  # (B, nv, 16, d+1)
    rs_all = np.concatenate(rs_np, axis=1)  # (B, nv, 16)
    h = flat[off : off + Bn * 16].reshape(Bn, 8, 2); off += Bn * 16
    tt = flat[off : off + Bn].reshape(Bn); off += Bn
    buf = flat[off : off + Bn * 32].reshape(Bn, 16, 2); off += Bn * 32
    blen = int(flat[off])

    from .transcript.device import DevTranscript

    proofs, challenges = [], []
    for b in range(Bn):
        proofs.append(msgs_from_host(msgs_all[b], degree))
        challenges.append(
            [Fr(col_int(rs_all[b, i]) * R_INV % P) for i in range(nv)]
        )
        hw, tw, bw = DevTranscript(h[b], tt[b], buf[b], blen).lower()
        fs_rngs[b].set_state(hw, tw, bw)
    return proofs, challenges


@functools.lru_cache(maxsize=None)
def _bkernel(half: int, B: int, num_slots: int, products: tuple, degree: int,
             do_fold: bool):
    """Batched fold+evaluate+reduce on (U, 16, B, half) pairs — slot axis
    leading (untiled, no sublane padding), instances side by side in lanes;
    every limb op runs per slot on (16, B, half) slices."""
    import jax
    import jax.numpy as jnp

    idx_np = np.array([list(ix) for ix in products], np.int32)

    def fn(lo, hi, r_b):  # r_b: (16, B)
        stacked = jnp.concatenate([lo, hi], axis=3)  # (U, 16, B, m)
        if do_fold:
            stacked = jnp.stack(
                [
                    engine.fold_tables(engine.DEVICE, stacked[u], r_b[:, :, None])
                    for u in range(num_slots)
                ]
            )
        m2 = stacked.shape[3] // 2
        if m2 <= (1 << 14):  # int32 block reduction stays exact
            from .ops.round_pallas import _block_sums

            E = [stacked[u][:, :, :m2] for u in range(num_slots)]
            O = [stacked[u][:, :, m2:] for u in range(num_slots)]
            part = _block_sums(E, O, None, products, degree)  # (d+1, 16, B)
            rows = jnp.moveaxis(part, 1, 0)  # (16, d+1, B) relaxed
            pad = [jnp.zeros_like(rows[0])] * (LJ.WIDE_DIGITS - NUM_DIGITS)
            strict, _ = LJ._chain([rows[i] for i in range(NUM_DIGITS)] + pad)
            sums = jnp.moveaxis(jnp.stack(strict), 1, 2)  # (WIDE, B, d+1)
        else:
            sums = engine.round_sums(
                engine.DEVICE, jnp.moveaxis(stacked, 0, 2), None,
                jnp.asarray(idx_np), degree,
            )  # (WIDE, B, d+1)
        if not do_fold:
            return None, sums  # avoid an un-donated pass-through copy
        return (stacked[:, :, :, :m2], stacked[:, :, :, m2:]), sums

    return jax.jit(fn, donate_argnums=(0, 1) if do_fold else ())


@functools.lru_cache(maxsize=None)
def _btranscript(blen_in: int, degree: int, B: int):
    """vmapped per-instance transcript round (reduce, feed, sample).
    Carry leaves are batched on axis 0; sums/canon/r on axis 1."""
    import jax

    from .protocol.device_prover import _ONE_DIGITS
    from .transcript.device import DevTranscript, blen_after_feed, feed_fr_vec, fr_rand

    blen_out = blen_after_feed(blen_in, 8 + 32 * (degree + 1))

    def single(carry, sums):
        ts = DevTranscript.from_carry(carry, blen_in)
        mont = LJ.reduce_wide(sums)
        canon = LJ.mont_mul_const(mont, _ONE_DIGITS)
        ts = feed_fr_vec(ts, canon)
        r_new, ts = fr_rand(ts)
        return ts.carry(), canon, r_new

    fn = jax.vmap(single, in_axes=((0, 0, 0), 1), out_axes=((0, 0, 0), 2, 1))
    return jax.jit(fn), blen_out


def _batched_carry(fs_rngs):
    """Host transcript states -> one batched device carry (B,8,2)/(B,)/(B,16,2).
    Requires equal pending-byte counts (shared static alignment)."""
    import jax.numpy as jnp

    states = [r.state_tuple() for r in fs_rngs]
    blen = len(states[0][2])
    if any(len(s[2]) != blen for s in states):
        return None, None
    M32 = (1 << 32) - 1
    h = np.array(
        [[(w & M32, w >> 32) for w in s[0]] for s in states], np.uint32
    )  # (B, 8, 2)
    t = np.array([s[1] for s in states], np.uint32)
    bufw = []
    for s in states:
        words = [int.from_bytes(s[2][8 * i : 8 * i + 8], "little") for i in range(blen // 8)]
        words += [0] * (16 - len(words))
        bufw.append([(w & M32, w >> 32) for w in words])
    buf = np.array(bufw, np.uint32) if bufw else np.zeros((len(states), 16, 2), np.uint32)
    return (jnp.asarray(h), jnp.asarray(t), jnp.asarray(buf)), blen


def _prove_batched_chained(fs_rngs, polynomials, degree: int, nv: int):
    """All B instances prove together with zero per-round host syncs; proofs
    byte-identical to per-instance `MLSumcheck.prove_as_subprotocol`."""
    import jax.numpy as jnp

    from .protocol.device_prover import col_int, init_pair
    from .transcript.device import DevTranscript

    B = len(polynomials)
    carry, blen = _batched_carry(fs_rngs)
    if carry is None:  # unequal pending-byte alignment: not vmappable
        return None
    pairs = [init_pair(p) for p in polynomials]
    products = pairs[0][2]
    if any(p[2] != products for p in pairs):
        # coefficient-folding plans diverged (e.g. mixed unit/non-unit
        # coefficients); the per-round host path handles it
        return None
    lo = jnp.stack([p[0] for p in pairs], axis=2)  # (U, 16, B, half)
    hi = jnp.stack([p[1] for p in pairs], axis=2)
    num_slots = lo.shape[0]

    msgs_dev, rs_dev = [], []
    r = jnp.zeros((NUM_DIGITS, B), jnp.uint32)
    for i in range(nv):
        half = lo.shape[3]
        kfn = _bkernel(half, B, num_slots, products, degree, i > 0)
        tfn, blen = _btranscript(blen, degree, B)
        pair, sums = kfn(lo, hi, r)
        if pair is not None:
            lo, hi = pair
        carry, canon, r = tfn(carry, sums)
        msgs_dev.append(canon)  # (16, d+1, B)
        rs_dev.append(r)  # (16, B)

    # single fetch: all rounds x instances + final transcript states
    import jax

    @jax.jit
    def pack(ms, rs, c):
        return jnp.concatenate(
            [jnp.stack(ms).reshape(-1), jnp.stack(rs).reshape(-1),
             c[0].reshape(-1), c[1].reshape(-1), c[2].reshape(-1)]
        )

    flat = np.asarray(pack(msgs_dev, rs_dev, carry))
    d1 = degree + 1
    o1 = nv * NUM_DIGITS * d1 * B
    o2 = o1 + nv * NUM_DIGITS * B
    msgs = flat[:o1].reshape(nv, NUM_DIGITS, d1, B)
    rs = flat[o1:o2].reshape(nv, NUM_DIGITS, B)
    h = flat[o2 : o2 + 16 * B].reshape(B, 8, 2)
    t = flat[o2 + 16 * B : o2 + 17 * B]
    buf = flat[o2 + 17 * B :].reshape(B, 16, 2)

    proofs, challenges = [], []
    for b in range(B):
        proofs.append(
            [
                ProverMsg([Fr(col_int(msgs[i, :, ti, b])) for ti in range(d1)])
                for i in range(nv)
            ]
        )
        challenges.append([Fr(col_int(rs[i, :, b]) * R_INV % P) for i in range(nv)])
        final = DevTranscript(h[b], t[b], buf[b], blen)
        hw, tw, bw = final.lower()
        fs_rngs[b].set_state(hw, tw, bw)
    return proofs, challenges


class BatchedMLSumcheck:
    """Prove B same-shaped instances at once (independent Fiat-Shamir
    transcripts; returns one proof per instance)."""

    @staticmethod
    def prove(polynomials: list[ListOfProductsOfPolynomials],
              mesh=None) -> list[list[ProverMsg]]:
        rngs = [Blake2b512Rng.setup() for _ in polynomials]
        return BatchedMLSumcheck.prove_as_subprotocol(rngs, polynomials,
                                                      mesh=mesh)[0]

    @staticmethod
    def prove_as_subprotocol(fs_rngs, polynomials, mesh=None):
        """With `mesh`, the instance axis is sharded over the device mesh
        (data parallelism — each device proves B/S instances; requires
        B % num_devices == 0 and the chained generic path)."""
        assert len(fs_rngs) == len(polynomials) and polynomials
        first = polynomials[0]
        nv = first.num_variables
        if nv == 0:
            raise SumcheckError("Attempt to prove a constant.")
        structure = [ix for _, ix in first.products]
        for poly in polynomials[1:]:
            if poly.num_variables != nv or [ix for _, ix in poly.products] != structure:
                raise SumcheckError("batched instances must share shape/structure")
        degree = first.max_multiplicands
        num_tables = len(first.flattened_ml_extensions)
        B = len(polynomials)
        n = 1 << nv

        # validate BEFORE feeding: a raise below must leave the caller-owned
        # transcripts untouched (feeding then raising would corrupt them)
        if mesh is not None:
            import numpy as _np

            S = int(_np.prod([mesh.shape[a] for a in mesh.axis_names]))
            if B % S:
                raise SumcheckError(
                    f"batch of {B} instances cannot be sharded over {S} devices"
                )
            if not (get_config().use_chained(n)
                    and get_config().chain_impl == "generic"
                    and all(isinstance(r, Blake2b512Rng) for r in fs_rngs)):
                raise SumcheckError(
                    "sharded batching requires the chained generic engine"
                )

        for rng, poly in zip(fs_rngs, polynomials):
            rng.feed(poly.info())

        if mesh is not None:
            return _prove_batched_generic(fs_rngs, polynomials, degree, nv,
                                          mesh=mesh)

        if get_config().use_chained(n) and all(
            isinstance(r, Blake2b512Rng) for r in fs_rngs
        ):
            if get_config().chain_impl == "generic":
                return _prove_batched_generic(fs_rngs, polynomials, degree, nv)
            res = _prove_batched_chained(fs_rngs, polynomials, degree, nv)
            if res is not None:
                return res

        # stack: (16, B, U+1, n), bit-reversed
        ones = np.broadcast_to(L.mont_scalar(1), (NUM_DIGITS, n))
        stacked = np.stack(
            [
                np.stack(
                    [to_bitrev(m.evals, nv) for m in poly.flattened_ml_extensions]
                    + [ones],
                    axis=1,
                )
                for poly in polynomials
            ],
            axis=1,
        )
        max_len = max(len(ix) for ix in structure)
        idx_mat = np.array(
            [ix + [num_tables] * (max_len - len(ix)) for ix in structure], dtype=np.int32
        )
        coeffs = np.stack(
            [
                np.stack([L.mont_scalar(c.v) for c, _ in poly.products], axis=1)
                for poly in polynomials
            ],
            axis=1,
        )[:, :, :, :, None]  # (16, B, P, 1, 1)

        use_device = get_config().use_device(n)
        if use_device:
            import jax.numpy as jnp

            stacked = jnp.asarray(stacked)

        proofs: list[list[ProverMsg]] = [[] for _ in range(B)]
        challenges: list[list[Fr]] = [[] for _ in range(B)]
        r_cols = np.zeros((NUM_DIGITS, B, 1, 1), np.uint32)
        for rnd_i in range(nv):
            do_fold = rnd_i > 0
            cur_n = stacked.shape[-1]
            on_device = not isinstance(stacked, np.ndarray)
            if on_device and not get_config().use_device(cur_n):
                stacked = np.asarray(stacked)
                on_device = False
            if on_device:
                import jax.numpy as jnp

                fn = _compiled_batched_round(
                    cur_n, B, len(idx_mat), max_len, degree, num_tables + 1, do_fold
                )
                new_stacked, sums = fn(
                    stacked, jnp.asarray(coeffs), jnp.asarray(idx_mat), jnp.asarray(r_cols)
                )
                if do_fold:
                    stacked = new_stacked
                sums = np.asarray(sums)  # (WIDE, B, d+1)
            else:
                if do_fold:
                    stacked = engine.fold_tables(engine.HOST, stacked, r_cols)
                sums = engine.round_sums(engine.HOST, stacked, coeffs, idx_mat, degree)

            for b in range(B):
                evals = [
                    Fr((LJ.wide_to_int(sums[:, b, t]) % P) * R_INV % P)
                    for t in range(degree + 1)
                ]
                msg = ProverMsg(evals)
                fs_rngs[b].feed(msg)
                proofs[b].append(msg)
                from .protocol.verifier import sample_round

                vm = sample_round(fs_rngs[b])
                challenges[b].append(vm.randomness)
                r_cols[:, b, 0, 0] = L.mont_scalar(vm.randomness.v)[:, 0]

        return proofs, challenges

    @staticmethod
    def verify(polynomial_infos, claimed_sums, proofs):
        """Verify each instance (host-side, already microseconds each)."""
        return [
            MLSumcheck.verify(info, s, pf)
            for info, s, pf in zip(polynomial_infos, claimed_sums, proofs)
        ]


@functools.lru_cache(maxsize=None)
def _bgkr_phase1(nnz: int, dim: int, mxu: str = "off"):
    import jax

    from .ops.gkr_init import _phase1_pair_body

    return jax.jit(jax.vmap(_phase1_pair_body(dim)))


@functools.lru_cache(maxsize=None)
def _bgkr_phase2(nnz: int, dim: int, mxu: str = "off"):
    import jax

    from .ops.gkr_init import _phase2_pair_body

    return jax.jit(jax.vmap(_phase2_pair_body(dim)))


class BatchedGKRRoundSumcheck:
    """Prove B independent GKR round-sumcheck instances at once (throughput
    mode, same pattern as `BatchedMLSumcheck`): the two vmapped fused phase
    inits + the batched generic round programs run all 2*dim rounds of all B
    instances with ONE host sync. Instances must share (dim, nnz); proofs
    are bit-identical to per-instance `GKRRoundSumcheck.prove`."""

    @staticmethod
    def prove(fs_rngs, f1s, f2s, f3s, gs):
        import jax.numpy as jnp

        from .gkr_round_sumcheck import GKRProof, GKRRoundSumcheck
        from .ops import gkr_init as GI
        from .protocol.device_prover import (
            lift_transcript,
            msgs_from_host,
        )
        from .transcript.device import DevTranscript

        Bn = len(f1s)
        if not (Bn and len(fs_rngs) == Bn == len(f2s) == len(f3s) == len(gs)):
            raise SumcheckError("batched GKR needs equal-length non-empty lists")
        dim = f2s[0].num_vars
        nnzs = {f1.num_nonzero for f1 in f1s}
        for f1, f2, f3 in zip(f1s, f2s, f3s):
            if not (f1.num_vars == 3 * dim and f2.num_vars == dim
                    and f3.num_vars == dim):
                raise SumcheckError("batched GKR instances must share dim")
        if (len(nnzs) != 1 or get_config().chain_impl != "generic"
                or not all(isinstance(r, Blake2b512Rng) for r in fs_rngs)):
            # graceful fallback: per-instance proving
            return [
                GKRRoundSumcheck.prove(r, f1, f2, f3, g)
                for r, f1, f2, f3, g in zip(fs_rngs, f1s, f2s, f3s, gs)
            ]

        splits = [GI._split_f1_device(f1, dim) for f1 in f1s]
        stk = [jnp.stack([s[i] for s in splits]) for i in range(8)]
        gbits, x, y_rev, vals, perm_x, last_x, perm_y, last_y = stk
        nnz = int(vals.shape[2])
        g_pts = [GI._points_arrays(list(g)) for g in gs]
        g_r = jnp.asarray(np.stack([p[0] for p in g_pts]))
        g_omr = jnp.asarray(np.stack([p[1] for p in g_pts]))
        f3_bitrev = jnp.stack([f3.device_bitrev() for f3 in f3s])
        f2_bitrev = jnp.stack([f2.device_bitrev() for f2 in f2s])

        from .ops.gkr_init import _mxu_key

        lo, hi, w = _bgkr_phase1(nnz, dim, _mxu_key())(
            gbits, perm_x, last_x, y_rev, vals, g_r, g_omr,
            f3_bitrev, f2_bitrev,
        )
        H0 = lo.shape[3]
        target = get_config().generic_pad_lanes()
        padw = ((0, 0), (0, 0), (0, 0), (0, max(0, (target or H0) - H0)))

        lifted = [lift_transcript(r) for r in fs_rngs]
        blen0 = lifted[0].blen
        if any(t.blen != blen0 for t in lifted):
            # unequal pending-byte alignment cannot vmap in lockstep —
            # graceful per-instance fallback, like the other mismatches
            return [
                GKRRoundSumcheck.prove(r, f1, f2, f3, g)
                for r, f1, f2, f3, g in zip(fs_rngs, f1s, f2s, f3s, gs)
            ]
        state = (
            jnp.stack([t.h for t in lifted]),
            jnp.stack([t.t for t in lifted]),
            jnp.stack([t.buf for t in lifted]),
            jnp.full((Bn,), blen0, jnp.uint32),
        )
        r = jnp.zeros((Bn, NUM_DIGITS), jnp.uint32)
        products = ((0, 1),)

        def run_phase(lo, hi, r, state):
            lo, hi = jnp.pad(lo, padw), jnp.pad(hi, padw)
            H = lo.shape[3]
            Blk = min(get_config().batch_block, H)
            parts = []
            step = _bstep_generic(H, 2, products, 2, Blk, "first_block")
            lo, hi, r, state, canon = step(lo, hi, jnp.uint32(H0), r, *state)
            parts.append((canon[:, None], r[:, None], 1))
            if dim > 1:
                cstep = _bchain_generic(H, 2, products, 2, Blk)
                lo, hi, r, state, msgs, rs = cstep(
                    lo, hi, jnp.uint32(H0 >> 1), jnp.int32(dim - 1), r, *state
                )
                parts.append((msgs, rs, dim - 1))
            return lo, hi, r, state, parts

        lo, hi, r, state, parts1 = run_phase(lo, hi, r, state)
        rs1 = jnp.concatenate([rr[:, :n] for _m, rr, n in parts1], axis=1)
        lo2, hi2 = _bgkr_phase2(nnz, dim, _mxu_key())(
            lo[:, :, :, :1], hi[:, :, :, :1], r,
            x, perm_y, last_y, w, rs1, f3_bitrev,
        )
        _lo, _hi, r, state, parts2 = run_phase(lo2, hi2, r, state)

        parts = parts1 + parts2
        flat = np.asarray(_bpack(parts, state))  # ONE host transfer
        d1 = 3
        off = 0
        msgs_np = []
        for m, rr, n in parts:
            sz = int(np.prod(m.shape))
            msgs_np.append(flat[off : off + sz].reshape(m.shape)[:, :n])
            off += sz
            off += int(np.prod(rr.shape))
        msgs_all = np.concatenate(msgs_np, axis=1)  # (B, 2*dim, 16, d1)
        h = flat[off : off + Bn * 16].reshape(Bn, 8, 2); off += Bn * 16
        tt = flat[off : off + Bn].reshape(Bn); off += Bn
        buf = flat[off : off + Bn * 32].reshape(Bn, 16, 2); off += Bn * 32
        blen = int(flat[off])

        proofs = []
        for b in range(Bn):
            proofs.append(GKRProof(
                msgs_from_host(msgs_all[b, :dim], 2),
                msgs_from_host(msgs_all[b, dim:], 2),
            ))
            hw, tw, bw = DevTranscript(h[b], tt[b], buf[b], blen).lower()
            fs_rngs[b].set_state(hw, tw, bw)
        return proofs
