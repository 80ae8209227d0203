"""Mesh-sharded MLSumcheck prover.

Drop-in replacement for the single-device round engine: proofs are
bit-identical to `MLSumcheck.prove` (the transcript consumes exact total
sums, and folding is shard-local), but each round's work is spread over a
`jax.sharding.Mesh` with one tiny `psum` of the (d+1) wide digit columns
(SURVEY.md §5 "Distributed communication backend").

Usage::

    mesh_prover = ShardedProver(mesh)            # or ShardedProver.auto()
    proof, state = mesh_prover.prove_as_subprotocol(fs_rng, poly)

or the convenience `mesh_prover.prove(poly)` mirroring `MLSumcheck.prove`.
"""

from __future__ import annotations

import functools

import numpy as np

from ..data_structures import ListOfProductsOfPolynomials
from ..fields import limbs_np as L
from ..fields.fr import NUM_DIGITS
from ..protocol import engine
from ..protocol.prover import ProverState, to_bitrev
from ..utils.config import get_config
from ..utils.errors import SumcheckError
from .mesh import default_mesh, from_sharded_layout, to_sharded_layout


class ShardedProverState(ProverState):
    """ProverState whose `stacked` is a mesh-sharded global array until the
    tail rounds migrate it to host."""

    def __init__(self, *args, mesh=None, num_shards=1, **kw):
        super().__init__(*args, **kw)
        self.mesh = mesh
        self.num_shards = num_shards


@functools.lru_cache(maxsize=None)
def _compiled_sharded_round(
    mesh, n_global: int, num_products: int, max_len: int, degree: int, num_slots: int, do_fold: bool
):
    """One jitted shard_map'd fold+evaluate+reduce+psum step per shape."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec_tables = P(None, None, "x")
    spec_rep = P()

    def per_shard(stacked, coeffs, idx_mat, r_col):
        if do_fold:
            stacked = engine.fold_tables(engine.DEVICE, stacked, r_col[:, None, :])
        sums = engine.round_sums(engine.DEVICE, stacked, coeffs, idx_mat, degree)
        # exact integer allreduce of strict wide digits (< 2^16 each):
        # no overflow below 2^16 shards, order-independent by exactness
        sums = jax.lax.psum(sums, "x")
        return (stacked if do_fold else None), sums

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec_tables, spec_rep, spec_rep, spec_rep),
        out_specs=(spec_tables if do_fold else spec_rep, spec_rep),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedProver:
    """Factory for mesh-sharded prover states; plugs into the standard
    `IPForMLSumcheck.prove_round` driver via subclassed state dispatch."""

    def __init__(self, mesh=None):
        import jax

        self.mesh = mesh if mesh is not None else default_mesh()
        self.num_shards = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
        assert self.num_shards & (self.num_shards - 1) == 0, "shard count must be a power of two"
        self._jax = jax

    @staticmethod
    def auto(num_devices: int | None = None) -> "ShardedProver":
        return ShardedProver(default_mesh(num_devices))

    def prover_init(self, polynomial: ListOfProductsOfPolynomials) -> ShardedProverState:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if polynomial.num_variables == 0:
            raise SumcheckError("Attempt to prove a constant.")
        nv = polynomial.num_variables
        n = 1 << nv
        k = self.num_shards.bit_length() - 1
        if n < 2 * self.num_shards:
            raise SumcheckError(
                f"table of 2^{nv} entries cannot be sharded over {self.num_shards} devices"
            )
        tables = [
            to_sharded_layout(m.evals, nv, k) for m in polynomial.flattened_ml_extensions
        ]
        tables.append(np.broadcast_to(L.mont_scalar(1), (NUM_DIGITS, n)))
        stacked_host = np.stack(tables, axis=1)
        sharding = NamedSharding(self.mesh, P(None, None, "x"))
        stacked = jax.device_put(stacked_host, sharding)
        state = ShardedProverState(
            [],
            [(c, list(ix)) for c, ix in polynomial.products],
            stacked,
            nv,
            polynomial.max_multiplicands,
            mesh=self.mesh,
            num_shards=self.num_shards,
        )
        state._sharded_rounds_left = nv - k  # rounds with >= 1 lane/shard
        return state

    def prove(self, polynomial):
        """Mirror of `MLSumcheck.prove` over this mesh (bit-identical proof)."""
        from ..transcript.blake2b_rng import Blake2b512Rng

        fs_rng = Blake2b512Rng.setup()
        return self.prove_as_subprotocol(fs_rng, polynomial)[0]

    def prove_as_subprotocol(self, fs_rng, polynomial):
        from ..protocol import IPForMLSumcheck

        fs_rng.feed(polynomial.info())
        prover_state = self.prover_init(polynomial)
        verifier_msg = None
        prover_msgs = []
        for _ in range(polynomial.num_variables):
            prover_msg = IPForMLSumcheck.prove_round(prover_state, verifier_msg)
            fs_rng.feed(prover_msg)
            prover_msgs.append(prover_msg)
            verifier_msg = IPForMLSumcheck.sample_round(fs_rng)
        prover_state.randomness.append(verifier_msg.randomness)
        return prover_msgs, prover_state


def run_sharded_round(state: ShardedProverState, r_col, do_fold: bool):
    """One mesh round; falls back to host when the local shard is exhausted.
    Called from `protocol.prover._run_round` via state-type dispatch."""
    import jax

    degree = state.max_multiplicands
    ones_slot = state.num_tables
    max_len = max(len(ix) for _, ix in state.list_of_products)
    idx_mat = np.array(
        [ix + [ones_slot] * (max_len - len(ix)) for _, ix in state.list_of_products],
        dtype=np.int32,
    )
    coeffs = np.stack(
        [L.mont_scalar(c.v) for c, _ in state.list_of_products], axis=1
    )[:, :, :, None]

    n = state.stacked.shape[2]
    sharded_left = getattr(state, "_sharded_rounds_left", 0)
    if sharded_left <= 0 or not get_config().use_device(n):
        # migrate to host: undo the shard-blocked layout for the remaining vars
        if not isinstance(state.stacked, np.ndarray):
            nv_left = n.bit_length() - 1  # 2^nv_left == current table length
            k = state.num_shards.bit_length() - 1
            host = np.asarray(state.stacked)
            natural = from_sharded_layout(host, nv_left, k)
            state.stacked = to_bitrev(natural, nv_left)
        if do_fold:
            state.stacked = engine.fold_tables(engine.HOST, state.stacked, r_col[:, None, :])
        return engine.round_sums(engine.HOST, state.stacked, coeffs, idx_mat, degree)

    import jax.numpy as jnp

    fn = _compiled_sharded_round(
        state.mesh, n, len(idx_mat), max_len, degree, ones_slot + 1, do_fold
    )
    new_stacked, sums = fn(
        state.stacked, jnp.asarray(coeffs), jnp.asarray(idx_mat), jnp.asarray(r_col)
    )
    if do_fold:
        state.stacked = new_stacked
    state._sharded_rounds_left = sharded_left - 1
    return np.asarray(sums)
