"""Native transcript/verifier core (`sumcheck_tpu/native/fastrng.c`) pinned
bit-equal to the pure-Python / hashlib paths it replaces.

The native core is the default when a C compiler is present; these tests
skip (rather than fail) on hosts where it can't build, because every caller
falls back to the Python paths there.
"""

import random

import pytest

from sumcheck_tpu.fields.fr import P
from sumcheck_tpu.native import lib
from sumcheck_tpu.protocol import verifier as V
from sumcheck_tpu.transcript.blake2b_rng import (
    Blake2b512Rng,
    _FastCore,
    _NativeCore,
    fr_rand,
)

pytestmark = pytest.mark.skipif(lib() is None, reason="native core unavailable")


def test_native_core_matches_hashlib():
    rnd = random.Random(0)
    nat, ref = _NativeCore(lib()), _FastCore()
    for i in range(300):
        data = rnd.randbytes(rnd.randrange(0, 300))
        nat.update(data)
        ref.update(data)
        assert nat.digest_clone() == ref.copy().digest(), f"iter {i}"
    assert nat.state_tuple() == ref.state_tuple()


def test_native_rng_chain_matches_python():
    rnd = random.Random(1)
    a = Blake2b512Rng.setup()
    assert isinstance(a._h, _NativeCore)  # default core on this host
    b = Blake2b512Rng.setup()
    b._h = _FastCore()
    for i in range(120):
        msg = rnd.randbytes(rnd.randrange(1, 200))
        a.feed(msg)
        b.feed(msg)
        assert fr_rand(a) == fr_rand(b), f"draw {i}"
        if i % 5 == 0:
            n = rnd.choice([0, 1, 4, 8, 63, 64, 65, 127, 128, 777])
            assert a.fill_bytes(n) == b.fill_bytes(n), f"fill({n})"
    assert a.state_tuple() == b.state_tuple()


def test_native_state_roundtrip():
    """set_state -> native core; continued stream matches an uninterrupted
    hashlib run (the chained-device-prove restore path)."""
    rnd = random.Random(2)
    a, b = Blake2b512Rng.setup(), Blake2b512Rng.setup()
    b._h = _FastCore()
    for _ in range(10):
        msg = rnd.randbytes(37)
        a.feed(msg)
        b.feed(msg)
    a.set_state(*a.state_tuple())  # round-trip through explicit state
    assert isinstance(a._h, _NativeCore)
    for _ in range(10):
        assert fr_rand(a) == fr_rand(b)


def test_native_interp_matches_python():
    rnd = random.Random(3)
    nat = V._native_interp()
    for _ in range(200):
        n = rnd.randrange(1, 12)
        vals = [rnd.randrange(P) for _ in range(n)]
        r = rnd.randrange(P)
        # pure-Python path (same function body the fallback runs)
        facs = [(r - j) % P for j in range(n)]
        suf = [1] * n
        for i in range(n - 2, -1, -1):
            suf[i] = suf[i + 1] * facs[i + 1] % P
        consts = V._lagrange_consts(n)
        acc, pre = 0, 1
        for i in range(n):
            acc = (acc + vals[i] * consts[i] % P * pre * suf[i]) % P
            pre = pre * facs[i] % P
        assert nat(vals, r, n) == acc


def test_native_check_rounds_matches_python(rnd):
    """Full verify through the one-call C check loop == the Python loop
    (force the fallback via a temporarily absent native ctx)."""
    from sumcheck_tpu import Fr, ListOfProductsOfPolynomials, MLSumcheck
    from sumcheck_tpu.mle import DenseMLE

    nv = 6
    poly = ListOfProductsOfPolynomials(nv)
    poly.add_product([DenseMLE.rand(nv, rnd) for _ in range(3)], Fr(7))
    proof = MLSumcheck.prove(poly)
    s = MLSumcheck.extract_sum(proof)
    sub_native = MLSumcheck.verify(poly.info(), s, proof)
    saved = V._native_state[0]
    try:
        V._native_state[0] = False  # force pure-Python check loop
        sub_py = MLSumcheck.verify(poly.info(), s, proof)
    finally:
        V._native_state[0] = saved
    assert sub_native.point == sub_py.point
    assert sub_native.expected_evaluation == sub_py.expected_evaluation


def test_native_verify_phase_matches_python(rnd):
    """The ONE-CALL whole-verify loop (`fr_verify_rounds`: feed + sample +
    check fused in C) against the per-round Python loop: same subclaim, same
    post-verify transcript state (verifies compose via
    `verify_as_subprotocol`), same Reject on a corrupted proof."""
    from sumcheck_tpu import (
        Blake2b512Rng, Fr, ListOfProductsOfPolynomials, MLSumcheck,
    )
    from sumcheck_tpu.mle import DenseMLE
    from sumcheck_tpu.utils.errors import Reject

    if V._native_ctx() is None:
        import pytest

        pytest.skip("native core unavailable")
    nv = 5
    poly = ListOfProductsOfPolynomials(nv)
    poly.add_product([DenseMLE.rand(nv, rnd) for _ in range(2)], Fr(3))
    poly.add_product([DenseMLE.rand(nv, rnd) for _ in range(3)], Fr(11))
    proof = MLSumcheck.prove(poly)
    s = MLSumcheck.extract_sum(proof)

    r_fast = Blake2b512Rng.setup()
    sub_fast = MLSumcheck.verify_as_subprotocol(r_fast, poly.info(), s, proof)
    saved = V._native_state[0]
    try:
        V._native_state[0] = False  # fast path refuses -> Python loop
        r_slow = Blake2b512Rng.setup()
        sub_slow = MLSumcheck.verify_as_subprotocol(
            r_slow, poly.info(), s, proof
        )
    finally:
        V._native_state[0] = saved
    assert sub_fast.point == sub_slow.point
    assert sub_fast.expected_evaluation == sub_slow.expected_evaluation
    assert r_fast.state_tuple() == r_slow.state_tuple()

    # Reject parity: corrupt one mid-proof evaluation
    bad = [type(m)(list(m.evaluations)) for m in proof]
    bad[2].evaluations[1] = bad[2].evaluations[1] + Fr(1)
    import pytest

    with pytest.raises(Reject):
        MLSumcheck.verify(poly.info(), s, bad)
    try:
        V._native_state[0] = False
        with pytest.raises(Reject):
            MLSumcheck.verify(poly.info(), s, bad)
    finally:
        V._native_state[0] = saved


def test_native_verify_phase_gkr_matches_python(rnd):
    """GKR verify through the fused C loop == Python loop (subclaim + the
    phase-2 chaining of phase-1's expected evaluation)."""
    import random as _random

    from sumcheck_tpu import Blake2b512Rng, Fr, GKRRoundSumcheck
    from sumcheck_tpu.fields.fr import P as _P
    from sumcheck_tpu.mle import DenseMLE, SparseMLE

    if V._native_ctx() is None:
        import pytest

        pytest.skip("native core unavailable")
    dim = 4
    prnd = _random.Random(97)
    f1 = SparseMLE.rand_with_config(3 * dim, 1 << dim, prnd)
    f2, f3 = DenseMLE.rand(dim, rnd), DenseMLE.rand(dim, rnd)
    g = [Fr(prnd.randrange(_P)) for _ in range(dim)]
    proof = GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
    s = proof.extract_sum()
    sub_fast = GKRRoundSumcheck.verify(Blake2b512Rng.setup(), dim, proof, s)
    saved = V._native_state[0]
    try:
        V._native_state[0] = False
        sub_slow = GKRRoundSumcheck.verify(
            Blake2b512Rng.setup(), dim, proof, s
        )
    finally:
        V._native_state[0] = saved
    assert sub_fast.u == sub_slow.u
    assert sub_fast.v == sub_slow.v
    assert sub_fast.expected_evaluation == sub_slow.expected_evaluation
    assert sub_fast.verify_subclaim(f1, f2, f3, g)
