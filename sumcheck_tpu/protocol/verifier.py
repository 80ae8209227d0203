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
from ..fields.fr import Fr, P
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
    Raises `Reject` on inconsistency — the only soundness rejection site.

    The per-round interpolations share ONE batched modular inversion across
    the whole proof (each round needs 1/(r_i - j) denominators; they depend
    only on the challenges and arrive all at once in this lazy design) —
    results are identical to per-round `interpolate_uni_poly`, the inversion
    `pow` just amortizes nv-fold."""
    if not verifier_state.finished:
        raise SumcheckError("Verifier has not finished.")
    if len(verifier_state.polynomials_received) != verifier_state.nv:
        raise SumcheckError("insufficient rounds")
    preps = []
    all_denoms = []
    for i in range(verifier_state.nv):
        evaluations = verifier_state.polynomials_received[i]
        prep = _interp_prepare([e.v for e in evaluations],
                               verifier_state.randomness[i].v)
        preps.append(prep)
        if prep[0] == "full":
            all_denoms.extend(prep[2])
    invs = _batch_inverse_int(all_denoms) if all_denoms else []
    pos = 0
    expected = asserted_sum
    for i, prep in enumerate(preps):
        evaluations = verifier_state.polynomials_received[i]
        # checks stay in the reference's per-round order (`verifier.rs:104-113`)
        if len(evaluations) != verifier_state.max_multiplicands + 1:
            raise SumcheckError("incorrect number of evaluations")
        if evaluations[0] + evaluations[1] != expected:
            raise Reject("Prover message is not consistent with the claim.")
        if prep[0] == "early":
            expected = Fr(prep[1])
        else:
            _tag, prod, denoms, p_vals = prep
            n = len(p_vals)
            consts = _lagrange_consts(n)
            acc = 0
            for k in range(n):
                acc = (acc + p_vals[k] * consts[k] * invs[pos + k]) % _P
            pos += n
            expected = Fr(prod * acc)
    return SubClaim(list(verifier_state.randomness), expected)


def _interp_prepare(p_vals: list[int], eval_at: int):
    """Phase 1 of interpolation: early-return detection, the (eval_at - j)
    factors, and their running product — everything except the inversion."""
    n = len(p_vals)
    if eval_at < n:  # challenge hit an integer node (reference early return)
        return ("early", p_vals[eval_at])
    denoms = []
    prod = 1
    for j in range(n):
        d = (eval_at - j) % _P
        denoms.append(d)
        prod = prod * d % _P
    return ("full", prod, denoms, p_vals)


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
    # raw-int inner loop: the verifier is pure Python and this path runs
    # nv times per verify — skipping the Fr wrapper (a __mod__ per op)
    # roughly halves its cost
    consts = _lagrange_consts(n)
    invs = _batch_inverse_int([e.v for e in evals])
    acc = 0
    for i in range(n):
        acc = (acc + p_i[i].v * consts[i] * invs[i]) % _P
    return Fr(prod.v * acc)


_P = P


def _lagrange_consts(n: int, _cache: dict = {}) -> list[int]:
    out = _cache.get(n)
    if out is None:
        fact = [1]
        for i in range(1, n):
            fact.append(fact[-1] * i % _P)
        out = [
            pow(fact[i] * fact[n - 1 - i] * (_P - 1) ** ((n - 1 - i) & 1), -1, _P)
            for i in range(n)
        ]
        _cache[n] = out
    return out


def _batch_inverse_int(xs: list[int]) -> list[int]:
    """Montgomery's trick: n inversions for one `pow` plus 3(n-1) multiplies."""
    prefix = []
    acc = 1
    for x in xs:
        acc = acc * x % _P
        prefix.append(acc)
    inv = pow(acc, -1, _P)
    out = [0] * len(xs)
    for i in range(len(xs) - 1, 0, -1):
        out[i] = inv * prefix[i - 1] % _P
        inv = inv * xs[i] % _P
    out[0] = inv
    return out
