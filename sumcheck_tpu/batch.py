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


class BatchedMLSumcheck:
    """Prove B same-shaped instances at once (independent Fiat-Shamir
    transcripts; returns one proof per instance)."""

    @staticmethod
    def prove(polynomials: list[ListOfProductsOfPolynomials]) -> list[list[ProverMsg]]:
        rngs = [Blake2b512Rng.setup() for _ in polynomials]
        return BatchedMLSumcheck.prove_as_subprotocol(rngs, polynomials)[0]

    @staticmethod
    def prove_as_subprotocol(fs_rngs, polynomials):
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

        for rng, poly in zip(fs_rngs, polynomials):
            rng.feed(poly.info())

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
