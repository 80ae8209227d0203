"""MLSumcheck round verifier — host-side, O(nv*d) field ops
(reference C9/C10, `src/ml_sumcheck/protocol/verifier.rs`).

Mirrors the reference's *lazy* design: `verify_round` only samples the
challenge and stores the received evaluations (`verifier.rs:54-83`); all
soundness checks happen in `check_and_generate_subclaim`
(`verifier.rs:90-121`): per round, the evaluation count must be d+1, then
`P_i(0) + P_i(1) == expected`, then `expected = P_i(r_i)` by interpolation.

`interpolate_uni_poly` evaluates the unique degree-<=d polynomial through
`(0, p[0])..(d, p[d])` at `r` (`verifier.rs:139-251`). The reference has three
integer-width branches for the factorial ratios (i64/i128/BigInt) purely as a
CPU optimization; the field *results* are branch-independent, so we keep one
field-arithmetic path (plus the same early return at integer points).
"""

from __future__ import annotations

from ..data_structures import PolynomialInfo
from ..fields.fr import Fr
from ..transcript.serialize import serialize_fr
from ..utils.errors import Reject, SumcheckError
from .prover import ProverMsg


class VerifierMsg:
    """Challenge sampled by the verifier (reference `VerifierMsg`)."""

    __slots__ = ("randomness",)

    def __init__(self, randomness: Fr):
        self.randomness = randomness

    def serialize_uncompressed(self) -> bytes:
        return serialize_fr(self.randomness)

    def __repr__(self) -> str:
        return f"VerifierMsg({self.randomness})"


class VerifierState:
    __slots__ = (
        "round",
        "nv",
        "max_multiplicands",
        "finished",
        "polynomials_received",
        "randomness",
    )

    def __init__(self, round: int, nv: int, max_multiplicands: int):
        self.round = round
        self.nv = nv
        self.max_multiplicands = max_multiplicands
        self.finished = False
        self.polynomials_received: list[list[Fr]] = []
        self.randomness: list[Fr] = []


class SubClaim:
    """Output of a convinced verifier: the claimed polynomial evaluates to
    `expected_evaluation` at `point` (reference `SubClaim`,
    `verifier.rs:29-34`). The caller must still check this against the
    polynomial itself."""

    __slots__ = ("point", "expected_evaluation")

    def __init__(self, point: list[Fr], expected_evaluation: Fr):
        self.point = point
        self.expected_evaluation = expected_evaluation


def verifier_init(index_info: PolynomialInfo) -> VerifierState:
    return VerifierState(1, index_info.num_variables, index_info.max_multiplicands)


def verify_round(prover_msg: ProverMsg, verifier_state: VerifierState, rng) -> VerifierMsg:
    """Sample challenge, store evaluations, defer all checks
    (reference `verify_round`, `verifier.rs:54-83`)."""
    if verifier_state.finished:
        raise SumcheckError("Incorrect verifier state: Verifier is already finished.")
    msg = sample_round(rng)
    verifier_state.randomness.append(msg.randomness)
    verifier_state.polynomials_received.append(list(prover_msg.evaluations))
    if verifier_state.round == verifier_state.nv:
        verifier_state.finished = True
    else:
        verifier_state.round += 1
    return msg


def check_and_generate_subclaim(verifier_state: VerifierState, asserted_sum: Fr) -> SubClaim:
    """All deferred soundness checks (reference `verifier.rs:90-121`).
    Raises `Reject` on inconsistency — the only soundness rejection site."""
    if not verifier_state.finished:
        raise SumcheckError("Verifier has not finished.")
    if len(verifier_state.polynomials_received) != verifier_state.nv:
        raise SumcheckError("insufficient rounds")
    expected = asserted_sum
    for i in range(verifier_state.nv):
        evaluations = verifier_state.polynomials_received[i]
        if len(evaluations) != verifier_state.max_multiplicands + 1:
            raise SumcheckError("incorrect number of evaluations")
        if evaluations[0] + evaluations[1] != expected:
            raise Reject("Prover message is not consistent with the claim.")
        expected = interpolate_uni_poly(evaluations, verifier_state.randomness[i])
    return SubClaim(list(verifier_state.randomness), expected)


def sample_round(rng) -> VerifierMsg:
    """Draw a uniform field challenge from the transcript RNG
    (reference `sample_round`, `verifier.rs:128-132`)."""
    return VerifierMsg(Fr.rand(rng))


def interpolate_uni_poly(p_i: list[Fr], eval_at: Fr) -> Fr:
    """Evaluate at `eval_at` the unique polynomial of degree < len(p_i) whose
    value at x = j is p_i[j] (reference `verifier.rs:139-251`)."""
    n = len(p_i)
    evals = [eval_at]  # eval_at - j for j = 0..n-1
    prod = eval_at
    check = Fr.zero()
    for i in range(1, n):
        if eval_at == check:
            return p_i[i - 1]
        check = check + Fr.one()
        tmp = eval_at - check
        evals.append(tmp)
        prod = prod * tmp
    if eval_at == check:
        return p_i[n - 1]

    # res = sum_i p_i[i] * prod_j (eval_at - j) / ((eval_at - i) * prod_{j!=i} (i-j))
    #     = prod * sum_i p_i[i] * C_i / evals[i],
    # with Lagrange constants C_i = 1 / (i! * (n-1-i)! * (-1)^(n-1-i)).
    # Algebraically identical to the reference's running-ratio recurrence
    # (`verifier.rs:191-248`; its three integer-width branches are a CPU
    # optimization with identical field results). C_i is cached per degree
    # and the per-term divisions are replaced by one batched inversion
    # (Montgomery's trick), so each call costs a single modular inversion.
    consts = _lagrange_consts(n)
    invs = _batch_inverse(evals)
    res = Fr.zero()
    for i in range(n):
        res = res + p_i[i] * consts[i] * invs[i]
    return prod * res


def _lagrange_consts(n: int, _cache: dict = {}) -> list[Fr]:
    out = _cache.get(n)
    if out is None:
        fact = [Fr.one()]
        for i in range(1, n):
            fact.append(fact[-1] * Fr(i))
        out = [
            (fact[i] * fact[n - 1 - i]).inverse() * (Fr(-1) ** (n - 1 - i))
            for i in range(n)
        ]
        _cache[n] = out
    return out


def _batch_inverse(xs: list[Fr]) -> list[Fr]:
    """Montgomery's trick: n inversions for one `pow` plus 3(n-1) multiplies."""
    prefix = []
    acc = Fr.one()
    for x in xs:
        acc = acc * x
        prefix.append(acc)
    inv = acc.inverse()
    out = [Fr.zero()] * len(xs)
    for i in range(len(xs) - 1, 0, -1):
        out[i] = inv * prefix[i - 1]
        inv = inv * xs[i]
    out[0] = inv
    return out
