"""GKR Round Sumcheck (Libra two-phase, [XZZPS19] §3.3) — reference L6,
`src/gkr_round_sumcheck/mod.rs` and `data_structures.rs`.

Proves `sum_{x,y} f1(g, x, y) * f2(x) * f3(y)` for sparse `f1` over 3*dim
variables and dense `f2`, `f3` over dim variables, reusing the MLSumcheck
round engine as a subroutine:

- phase 1: build `h_g(x) = sum_y f1(g, x, y) * f3(y)` (a sparse-weighted
  scatter over f1's nonzeros, reference `mod.rs:22-42`), then run a dim-round
  degree-2 sumcheck on `h_g * f2` -> randomness `u`;
- phase 2: fix `f1_g` at `u`, densify, and sumcheck `f1(g,u,.) * (f2(u)*f3)`
  -> randomness `v`.

Transcript parity note: the reference feeds ONLY prover messages — `g`, the
dimensions, and the claimed sum are NOT absorbed (`mod.rs:114,128`; no domain
separation). We replicate that exactly for bit-exactness.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .data_structures import ListOfProductsOfPolynomials, PolynomialInfo
from .fields import limbs_np as L
from .fields.fr import Fr
from .mle import DenseMLE, SparseMLE, _segment_sum_mod_p
from .protocol import IPForMLSumcheck
from .protocol.prover import ProverMsg, ProverState


def initialize_phase_one(
    f1: SparseMLE, f3: DenseMLE, g: Sequence[Fr]
) -> tuple[DenseMLE, SparseMLE]:
    """Build the Libra helper table `h_g(x) = sum_y f1(g,x,y) * f3(y)` and
    return it with `f1` fixed at `g` (reference `mod.rs:22-42`).

    The reference's scalar scatter loop (`a_hg[x] += v * f3[y]`) becomes a
    vectorized gather (f3 at y), batched Montgomery multiply, and a sorted
    segment-sum over x — the TPU-idiomatic shape for random-index
    accumulation (SURVEY.md Stage 4)."""
    dim = f3.num_vars
    assert f1.num_vars == dim * 3
    assert len(g) == dim
    f1_g = f1.fix_variables(list(g))  # sparse over 2*dim vars (x then y)
    a_hg = L.zeros(1 << dim)
    if f1_g.num_nonzero:
        idx = f1_g.indices
        x = (idx & ((1 << dim) - 1)).astype(np.int64)
        y = (idx >> dim).astype(np.int64)
        vals = L.mont_mul(f1_g.values, f3.evals[:, y])
        uniq, inverse = np.unique(x, return_inverse=True)
        merged = _segment_sum_mod_p(vals, inverse, len(uniq))
        a_hg[:, uniq] = merged
    return DenseMLE(dim, a_hg), f1_g


def start_phase1_sumcheck(h_g: DenseMLE, f2: DenseMLE) -> ProverState:
    """Wrap `h_g * f2` as a 1-product polynomial and init the round prover
    (reference `mod.rs:45-54`)."""
    dim = h_g.num_vars
    assert f2.num_vars == dim
    poly = ListOfProductsOfPolynomials(dim)
    poly.add_product([h_g, f2], Fr.one())
    return IPForMLSumcheck.prover_init(poly)


def initialize_phase_two(f1_g: SparseMLE, u: Sequence[Fr]) -> DenseMLE:
    """`f1` fixed at `g || u`, densified (reference `mod.rs:57-63`)."""
    assert len(u) * 2 == f1_g.num_vars
    return f1_g.fix_variables(list(u)).to_dense()


def start_phase2_sumcheck(f1_gu: DenseMLE, f3: DenseMLE, f2_u: Fr) -> ProverState:
    """Prove `sum_y f1(g,u,y) * f2(u) * f3(y)` as `f1_gu * (f2_u * f3)`
    (reference `mod.rs:66-82`)."""
    f3_f2u = DenseMLE.zero().scaled_add(f2_u, f3)
    dim = f1_gu.num_vars
    assert f3.num_vars == dim
    poly = ListOfProductsOfPolynomials(dim)
    poly.add_product([f1_gu, f3_f2u], Fr.one())
    return IPForMLSumcheck.prover_init(poly)


def _prove_chained(rng, f1: SparseMLE, f2: DenseMLE, f3: DenseMLE,
                   g: Sequence[Fr], dim: int) -> "GKRProof":
    """Whole-GKR-prove on device: phase-1 init, both dim-round sumchecks,
    the phase-2 init (which consumes phase-1's challenges), and the
    Fiat-Shamir transcript all chain on device; the host synchronizes once
    at the end (same schedule as the host path — proofs are byte-identical).
    """
    import jax.numpy as jnp

    from .ops import gkr_init as GI
    from .protocol.device_prover import (
        chain_rounds,
        fetch_chain_outputs,
        lift_transcript,
        msgs_from_host,
        restore_transcript,
    )
    from .utils.config import get_config

    ts = lift_transcript(rng)
    products = ((0, 1),)  # unit coefficient: nothing to fold into the tables

    if get_config().chain_impl == "generic":
        # ONE compiled round program serves all 2*dim rounds of BOTH phases
        # (same table extent, slots, degree) — see protocol/generic_prover.py;
        # each phase's init + pair prep is ONE fused dispatch (~2 ms per
        # async dispatch through the tunnel).
        from .protocol.generic_prover import _fetch, chain_rounds_generic, pad_pair

        (gbits_d, x, yrev_d, vals_d, perm_x, last_x, perm_y, last_y) = (
            GI._split_f1_device(f1, dim)
        )
        nnz = int(vals_d.shape[1])
        narrow_x, narrow_y = GI._seg_narrow(f1)
        # cold path: compile all five GKR programs concurrently — the two
        # fused pair inits here, the first/fold/tail chain programs below —
        # while f2/f3/f1-split uploads proceed (VERDICT round-4 ask #4)
        from .protocol.generic_prover import prewarm_family_async

        pair_warm = GI.warm_pair_programs_async(
            nnz, dim, GI._mxu_key(), not narrow_x, not narrow_y
        )
        H0_w = 1 << (dim - 1)
        target = get_config().generic_pad_lanes()
        H_w = target if (target and H0_w < target) else H0_w
        B_w = min(get_config().generic_block, H_w)
        prewarm_family_async(H_w, 2, products, 2, B_w, True, H0_w, dim)
        g_r, g_omr = GI._points_arrays(list(g))
        if pair_warm is not None:
            pair_warm["p1"].result()  # join: never race the warm compile
        lo1, hi1, w = GI._compiled_phase1_pair(
            nnz, dim, GI._mxu_key(), not narrow_x)(
            gbits_d, perm_x, last_x, yrev_d, vals_d,
            jnp.asarray(g_r), jnp.asarray(g_omr),
            f3.device_bitrev(), f2.device_bitrev(),
        )
        H0 = lo1.shape[2]
        lo1, hi1 = pad_pair(lo1, hi1)
        state = (ts.h, ts.t, ts.buf, jnp.uint32(ts.blen))
        parts1, state, pair1, r_last = chain_rounds_generic(
            lo1, hi1, state, products, 2, dim, active_pairs=H0
        )
        rs1_dev = jnp.concatenate([rs[:n] for _m, rs, n in parts1], axis=0)
        if pair_warm is not None:
            pair_warm["p2"].result()
        lo2, hi2 = GI._compiled_phase2_pair(
            nnz, dim, GI._mxu_key(), not narrow_y)(
            pair1[0][:, :, :1], pair1[1][:, :, :1], r_last,
            x, perm_y, last_y, w, rs1_dev, f3.device_bitrev(),
        )
        lo2, hi2 = pad_pair(lo2, hi2)
        parts2, state, _pair2, _r = chain_rounds_generic(
            lo2, hi2, state, products, 2, dim, active_pairs=H0
        )
        msgs_h, _rs_h, carry_h, blen = _fetch(parts1 + parts2, state, 2)
        restore_transcript(rng, carry_h, blen)
        return GKRProof(
            msgs_from_host(msgs_h[:dim], 2), msgs_from_host(msgs_h[dim:], 2)
        )

    hg_dev, (x, perm_y, last_y, w, narrow_y) = GI.phase1_init_device_arrays(
        f1, f3, list(g), dim
    )
    lo1, hi1 = GI._compiled_prep1(dim)(hg_dev, f2.device_bitrev())
    msgs1, rs1, carry, blen, pair1 = chain_rounds(
        lo1, hi1, ts.carry(), ts.blen, products, 2, dim
    )
    # f2(u): the chain left every table folded dim-1 times (1 lane); one more
    # fold by the final challenge evaluates slot 1 = f2 at u.
    f2_u = GI._compiled_final_fold(1)(pair1[0], pair1[1], rs1[-1])
    f1_gu = GI._compiled_phase2_digits(
        int(x.shape[0]), dim, GI._mxu_key(), not narrow_y
    )(x, perm_y, last_y, w, jnp.stack(rs1))
    lo2, hi2 = GI._compiled_prep2(dim, GI._mxu_key())(f1_gu, f3.device_bitrev(), f2_u)

    msgs2, rs2, carry, blen, _ = chain_rounds(
        lo2, hi2, carry, blen, products, 2, dim
    )

    # ONE synchronization for both phases + final transcript state
    msgs_h, _rs_h, carry_h = fetch_chain_outputs(
        msgs1 + msgs2, rs1 + rs2, carry, 2
    )
    restore_transcript(rng, carry_h, blen)
    return GKRProof(
        msgs_from_host(msgs_h[:dim], 2), msgs_from_host(msgs_h[dim:], 2)
    )


class GKRProof:
    """Proof for a GKR round function (reference `data_structures.rs:9-19`)."""

    __slots__ = ("phase1_sumcheck_msgs", "phase2_sumcheck_msgs")

    def __init__(self, phase1_sumcheck_msgs: list[ProverMsg], phase2_sumcheck_msgs: list[ProverMsg]):
        self.phase1_sumcheck_msgs = phase1_sumcheck_msgs
        self.phase2_sumcheck_msgs = phase2_sumcheck_msgs

    def extract_sum(self) -> Fr:
        return (
            self.phase1_sumcheck_msgs[0].evaluations[0]
            + self.phase1_sumcheck_msgs[0].evaluations[1]
        )

    def serialize_uncompressed(self) -> bytes:
        """Byte encoding the reference lacks (`data_structures.rs:9-13` has
        no CanonicalSerialize derive): the two phases as the encoding that
        derive WOULD produce — two length-prefixed `Vec<ProverMsg>`."""
        from .ml_sumcheck import serialize_proof

        return serialize_proof(self.phase1_sumcheck_msgs) + serialize_proof(
            self.phase2_sumcheck_msgs
        )

    @staticmethod
    def deserialize_uncompressed(data: bytes) -> "GKRProof":
        from .ml_sumcheck import _deserialize_proof_prefix
        from .utils.errors import SerializationError

        p1, off1 = _deserialize_proof_prefix(data)
        p2, off2 = _deserialize_proof_prefix(data[off1:])
        if off1 + off2 != len(data):
            raise SerializationError("trailing bytes in GKRProof encoding")
        if len(p1) != len(p2):
            raise SerializationError("GKR phases have unequal round counts")
        if not p1:
            raise SerializationError("GKRProof encoding has zero rounds")
        return GKRProof(p1, p2)


class GKRRoundSumcheckSubClaim:
    """Subclaim from a convinced GKR verifier
    (reference `data_structures.rs:22-57`)."""

    __slots__ = ("u", "v", "expected_evaluation")

    def __init__(self, u: list[Fr], v: list[Fr], expected_evaluation: Fr):
        self.u = u
        self.v = v
        self.expected_evaluation = expected_evaluation

    def verify_subclaim(
        self, f1: SparseMLE, f2: DenseMLE, f3: DenseMLE, g: Sequence[Fr]
    ) -> bool:
        dim = len(self.u)
        assert len(self.v) == dim
        assert f1.num_vars == 3 * dim and f2.num_vars == dim and f3.num_vars == dim
        assert len(g) == dim
        guv = list(g) + list(self.u) + list(self.v)
        actual = f1.evaluate(guv) * f2.evaluate(self.u) * f3.evaluate(self.v)
        return actual == self.expected_evaluation


class GKRRoundSumcheck:
    """Sumcheck argument for a GKR round function (reference `mod.rs:85-192`)."""

    @staticmethod
    def prove(
        rng, f1: SparseMLE, f2: DenseMLE, f3: DenseMLE, g: Sequence[Fr]
    ) -> GKRProof:
        """Caller supplies the transcript RNG (unlike `MLSumcheck.prove`)."""
        from .portable import PortableDenseMLE, gkr_prove

        if isinstance(f2, PortableDenseMLE):  # per-instance generic field
            return gkr_prove(rng, f1, f2, f3, g)
        assert f1.num_vars == 3 * f2.num_vars
        assert f1.num_vars == 3 * f3.num_vars
        dim = f2.num_vars
        g = list(g)

        from .transcript.blake2b_rng import Blake2b512Rng
        from .utils.config import get_config

        if (
            get_config().use_chained(max(f1.num_nonzero, 1 << dim))
            and isinstance(rng, Blake2b512Rng)
            and dim >= 1
        ):
            return _prove_chained(rng, f1, f2, f3, g, dim)

        use_device_init = get_config().use_device(f1.num_nonzero)
        phase2_carry = None
        if use_device_init:
            from .ops.gkr_init import phase1_init_device

            hg_arr, phase2_carry = phase1_init_device(
                f1.indices, f1.values, f3.evals, g, dim
            )
            h_g = DenseMLE(dim, hg_arr)
        else:
            h_g, f1_g = initialize_phase_one(f1, f3, g)
        phase1_ps = start_phase1_sumcheck(h_g, f2)
        phase1_vm = None
        phase1_msgs = []
        u: list[Fr] = []
        for _ in range(dim):
            pm = IPForMLSumcheck.prove_round(phase1_ps, phase1_vm)
            rng.feed(pm)
            phase1_msgs.append(pm)
            vm = IPForMLSumcheck.sample_round(rng)
            phase1_vm = vm
            u.append(vm.randomness)

        if use_device_init:
            from .ops.gkr_init import phase2_init_device

            f1_gu = DenseMLE(dim, phase2_init_device(phase2_carry, u, dim))
        else:
            f1_gu = initialize_phase_two(f1_g, u)
        phase2_ps = start_phase2_sumcheck(f1_gu, f3, f2.evaluate(u))
        phase2_vm = None
        phase2_msgs = []
        v: list[Fr] = []
        for _ in range(dim):
            pm = IPForMLSumcheck.prove_round(phase2_ps, phase2_vm)
            rng.feed(pm)
            phase2_msgs.append(pm)
            vm = IPForMLSumcheck.sample_round(rng)
            phase2_vm = vm
            v.append(vm.randomness)

        return GKRProof(phase1_msgs, phase2_msgs)

    @staticmethod
    def verify(
        rng, f2_num_vars: int, proof: GKRProof, claimed_sum: Fr
    ) -> GKRRoundSumcheckSubClaim:
        """Two chained degree-2 verification passes; phase 2's claimed sum is
        phase 1's expected evaluation (reference `mod.rs:147-192`).
        Raises `Reject` on inconsistency."""
        f = getattr(claimed_sum, "f", None)  # FieldEl -> its generic field
        if f is not None and not f.is_default:
            from .portable import gkr_verify

            return gkr_verify(rng, f, f2_num_vars, proof, claimed_sum)
        dim = f2_num_vars

        def run_phase(msgs, asserted: Fr):
            """One dim-round degree-2 verification pass over `rng`: the
            whole loop in one C call when the native core applies
            (`protocol/verifier.native_verify_phase`), else the reference
            per-round loop — identical bytes, results, and rejections."""
            if len(msgs) >= dim > 0:
                from .protocol.verifier import native_verify_phase

                fast = native_verify_phase(rng, msgs[:dim], 3, asserted.v)
                if fast is not None:
                    point, final = fast
                    return [Fr(x) for x in point], Fr(final)
            vs = IPForMLSumcheck.verifier_init(
                PolynomialInfo(max_multiplicands=2, num_variables=dim)
            )
            for i in range(dim):
                pm = msgs[i]
                rng.feed(pm)
                IPForMLSumcheck.verify_round(pm, vs, rng)
            sub = IPForMLSumcheck.check_and_generate_subclaim(vs, asserted)
            return sub.point, sub.expected_evaluation

        u, expected1 = run_phase(proof.phase1_sumcheck_msgs, claimed_sum)
        v, expected2 = run_phase(proof.phase2_sumcheck_msgs, expected1)

        return GKRRoundSumcheckSubClaim(
            u=u, v=v, expected_evaluation=expected2
        )
