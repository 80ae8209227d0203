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
