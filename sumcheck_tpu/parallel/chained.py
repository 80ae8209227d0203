"""Chained mesh-sharded MLSumcheck prover: ONE host synchronization per prove.

Round-1's `ShardedProver` (`parallel/prover.py`) psums exact partial sums but
keeps the Fiat-Shamir transcript on the host — a device->host->device sync
every round (~35 ms x nv on a tunneled pod). This module puts the (replicated)
device transcript INSIDE the sharded step, exactly like the single-chip
chained prover: per round, each shard folds its local pair stripes, computes
its partial (d+1) wide-digit sums, `lax.psum`s them over the mesh axis, and
then every shard runs the identical feed/sample — so the challenge is already
replicated for the next round's local fold. The host enqueues all rounds
asynchronously and fetches the proof once (VERDICT.md round-1 item 5; the
fold-reduce shape mirrors `prover.rs:138-148`).

Layout — cyclic (mod-S) pair distribution. The bit-reversed pair buffers
(lo, hi) of width H are dealt to S shards by lane index mod S: shard s holds
global pair lanes {j : j = l*S + s}, stored contiguously as local lane l.
Because every sharded round's pairing partner sits at distance A2 (a multiple
of S while A2 >= S), BOTH the fold and the evaluation pairing stay
shard-local, and the local buffers are themselves a valid pair-form table
with active extent A2/S — so the UNMODIFIED shape-generic round step
(`protocol/generic_prover._generic_step`) runs per shard; only the psum of
the partial sums is added. The lane-mod-S bits are the bit-reversed TOP
natural index bits — the variables folded last (SURVEY.md §5 hypercube
sharding), matching `parallel/mesh.py`'s framing.

Tail: when A2 < S, each shard holds exactly one active pair; an `all_gather`
(tiled over the lane axis — shard s's lane 0 IS global lane s) produces the
replicated (U, 16, S) remnant, and the remaining log2(S) rounds run
replicated through the same generic tail programs. Exactness: the psum adds
strict wide digits (< 2^16) over S shards — exact in uint32 far beyond any
real mesh, order-irrelevant — so proofs are byte-identical to
`MLSumcheck.prove` (pinned by `tests/test_sharded.py`).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.fr import Fr, NUM_DIGITS, P, R_INV
from ..protocol.device_prover import (
    _fold_plan,
    col_int,
    lift_transcript,
    msgs_from_host,
    restore_transcript,
)
from ..protocol.generic_prover import _chain_step, _fetch, _generic_step
from ..protocol.prover import ProverState, to_bitrev
from ..utils.errors import SumcheckError
from .mesh import default_mesh


@functools.lru_cache(maxsize=None)
def _sharded_step(mesh, H_loc: int, num_slots: int, products: tuple,
                  degree: int, block: int, variant: str):
    """shard_map-wrapped generic round step.

    Inside shard_map, the step's table math sees only the local
    (U, 16, H_loc) buffers; `axis_name="x"` makes the step psum its partial
    accumulator before the (replicated) transcript feed/sample — the ONLY
    communication, one (WIDE, d+1) u32 allreduce per round."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    raw = _generic_step.__wrapped__(
        H_loc, num_slots, products, degree, block, variant, False,
        axis_name="x", jit=False,
    )
    spec_t = Pspec(None, None, "x")
    rep = Pspec()
    fn = shard_map(
        raw,
        mesh=mesh,
        in_specs=(spec_t, spec_t, rep, rep, rep, rep, rep, rep),
        out_specs=(spec_t, spec_t, rep, (rep, rep, rep, rep), rep),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=None)
def _sharded_chain(mesh, H_loc: int, num_slots: int, products: tuple,
                   degree: int, block: int):
    """shard_map-wrapped multi-round chain (see `_chain_step`): ONE dispatch
    runs a dynamic number of sharded rounds, each psum-ing its partials and
    advancing the replicated transcript."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    raw = _chain_step.__wrapped__(
        H_loc, num_slots, products, degree, block, False,
        axis_name="x", jit=False,
    )
    spec_t = Pspec(None, None, "x")
    rep = Pspec()
    fn = shard_map(
        raw,
        mesh=mesh,
        in_specs=(spec_t, spec_t, rep, rep, rep, rep, rep, rep, rep),
        out_specs=(spec_t, spec_t, rep, (rep, rep, rep, rep), rep, rep),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=None)
def _gather_remnant(mesh, num_slots: int):
    """all_gather each shard's single active pair lane -> replicated
    (U, 16, S) pair (shard s's local lane 0 is global lane s)."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    def fn(lo, hi):
        glo = jax.lax.all_gather(lo[:, :, :1], "x", axis=2, tiled=True)
        ghi = jax.lax.all_gather(hi[:, :, :1], "x", axis=2, tiled=True)
        return glo, ghi

    wrapped = shard_map(
        fn, mesh=mesh,
        in_specs=(Pspec(None, None, "x"), Pspec(None, None, "x")),
        out_specs=(Pspec(), Pspec()),
        check_vma=False,
    )
    return jax.jit(wrapped)


class ChainedShardedProver:
    """Mesh-sharded prove with the transcript on device (one final sync)."""

    def __init__(self, mesh=None, block: int | None = None):
        self.mesh = mesh if mesh is not None else default_mesh()
        self.num_shards = int(
            np.prod([self.mesh.shape[a] for a in self.mesh.axis_names])
        )
        assert self.num_shards & (self.num_shards - 1) == 0
        self.block = block

    @staticmethod
    def auto(num_devices: int | None = None) -> "ChainedShardedProver":
        return ChainedShardedProver(default_mesh(num_devices))

    def prove(self, polynomial):
        from ..transcript.blake2b_rng import Blake2b512Rng

        fs_rng = Blake2b512Rng.setup()
        return self.prove_as_subprotocol(fs_rng, polynomial)[0]

    def _init_sharded_pair(self, polynomial):
        """Global bitrev pair with coefficients folded in, dealt mod-S, and
        device_put with lane sharding (host-side build: the sharded path's
        instances are constructed per-host anyway)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        from ..fields import limbs_np as L

        nv = polynomial.num_variables
        n = 1 << nv
        products, scale_plan, num_slots, need_ones = _fold_plan(polynomial)
        mles = polynomial.flattened_ml_extensions
        tabs = [to_bitrev(m.evals, nv) for m in mles]
        for dst, src, c in scale_plan:
            scaled = L.mont_mul(tabs[src], L.mont_scalar(c))
            if dst == src:
                tabs[src] = scaled
            else:
                tabs.append(scaled)
        if need_ones:
            tabs.append(np.broadcast_to(L.mont_scalar(1), (NUM_DIGITS, n)).copy())
        stacked = np.stack(tabs, axis=0)  # (U, 16, n)
        H = n // 2
        S = self.num_shards
        lo, hi = stacked[:, :, :H], stacked[:, :, H:]
        # cyclic deal: local lane l on shard s holds global pair lane l*S + s
        lo = lo.reshape(num_slots, NUM_DIGITS, H // S, S)
        lo = np.ascontiguousarray(np.moveaxis(lo, 3, 2)).reshape(
            num_slots, NUM_DIGITS, H
        )
        hi = hi.reshape(num_slots, NUM_DIGITS, H // S, S)
        hi = np.ascontiguousarray(np.moveaxis(hi, 3, 2)).reshape(
            num_slots, NUM_DIGITS, H
        )
        sharding = NamedSharding(self.mesh, Pspec(None, None, "x"))

        # make_array_from_callback (not device_put): each process materializes
        # only its ADDRESSABLE shards, so the same code path serves a mesh
        # spanning multiple hosts (BASELINE config 5 — jax.distributed pods,
        # where device_put of a host-global array cannot address remote chips)
        def _mk(arr):
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx]
            )

        return (
            _mk(lo),
            _mk(hi),
            products,
            polynomial.max_multiplicands,
            num_slots,
        )

    def prove_as_subprotocol(self, fs_rng, polynomial):
        import jax.numpy as jnp

        from ..utils.config import get_config

        nv = polynomial.num_variables
        if nv == 0:
            raise SumcheckError("Attempt to prove a constant.")
        S = self.num_shards
        sigma = S.bit_length() - 1
        H = 1 << (nv - 1)
        if H < S:
            raise SumcheckError(
                f"table of 2^{nv} entries cannot be sharded over {S} devices"
            )

        fs_rng.feed(polynomial.info())
        lo, hi, products, degree, num_slots = self._init_sharded_pair(polynomial)
        ts = lift_transcript(fs_rng)
        state = (ts.h, ts.t, ts.buf, jnp.uint32(ts.blen))

        H_loc = H // S
        B = min(self.block or get_config().generic_block, H_loc)
        r = jnp.zeros((NUM_DIGITS,), jnp.uint32)
        parts = []

        num_sharded = nv - sigma  # rounds with >= 1 active pair per shard
        step = _sharded_step(
            self.mesh, H_loc, num_slots, products, degree, B, "first_block"
        )
        lo, hi, r, state, canon = step(lo, hi, jnp.uint32(H_loc), r, *state)
        parts.append((canon[None], r[None], 1))

        if num_sharded > 1:
            cstep = _sharded_chain(
                self.mesh, H_loc, num_slots, products, degree, B
            )
            lo, hi, r, state, msgs, rs = cstep(
                lo, hi, jnp.uint32(H_loc >> 1), jnp.int32(num_sharded - 1),
                r, *state
            )
            parts.append((msgs, rs, num_sharded - 1))

        if sigma:
            # replicated tail: gather the one-pair-per-shard remnant and run
            # the remaining rounds identically on every device, in one chain
            lo, hi = _gather_remnant(self.mesh, num_slots)(lo, hi)
            Bt = min(self.block or get_config().generic_block, S)
            cstep = _chain_step(S, num_slots, products, degree, Bt, False)
            lo, hi, r, state, msgs, rs = cstep(
                lo, hi, jnp.uint32(S >> 1), jnp.int32(sigma), r, *state
            )
            parts.append((msgs, rs, sigma))

        msgs_h, rs_h, carry_h, blen = _fetch(parts, state, degree)
        prover_msgs = msgs_from_host(msgs_h, degree)
        randomness = [Fr(col_int(rd) * R_INV % P) for rd in rs_h]
        restore_transcript(fs_rng, carry_h, blen)

        prover_state = ProverState(
            randomness=randomness,
            list_of_products=[(c, list(ix)) for c, ix in polynomial.products],
            stacked=(lo, hi),
            num_vars=nv,
            max_multiplicands=degree,
        )
        prover_state.round = nv
        return prover_msgs, prover_state
