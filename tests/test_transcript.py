"""Fiat-Shamir transcript tests, mirroring the reference's RNG determinism
property test (`src/rng.rs:83-176`) plus serialization-format pins."""

import random

from sumcheck_tpu.fields.fr import Fr, P, R_INV
from sumcheck_tpu.transcript.blake2b_rng import Blake2b512Rng, fr_rand
from sumcheck_tpu.transcript.serialize import (
    serialize_fr,
    serialize_fr_vec,
    serialize_u8_vec,
    serialize_usize,
)


def _rw_sequence(rng, msgs):
    """Interleaved feed/sample schedule from the reference test
    (`rng.rs:109-170`), including unaligned fill_bytes sizes."""
    out = []
    rng.feed(serialize_u8_vec(msgs[0]))
    out.append(fr_rand(rng))
    out.append(fr_rand(rng))
    rng.feed(serialize_u8_vec(msgs[1]))
    rng.feed(serialize_u8_vec(msgs[2]))
    out.append(fr_rand(rng))
    rng.feed(serialize_u8_vec(msgs[3]))
    out.append(fr_rand(rng))
    out.append(fr_rand(rng))
    rng.feed(serialize_u8_vec(msgs[4]))
    rng.feed(serialize_u8_vec(msgs[5]))
    rng.feed(serialize_u8_vec(msgs[6]))
    f1 = fr_rand(rng)
    f2 = fr_rand(rng)
    assert f1 != f2, "Producing same element"
    out += [f1, f2, fr_rand(rng), fr_rand(rng)]
    buf1 = rng.fill_bytes(127)
    rng.feed(serialize_u8_vec(buf1))
    buf2 = rng.fill_bytes(128)
    buf3 = rng.fill_bytes(777)
    assert buf2[:64] != buf3[:64]
    out.append(fr_rand(rng))
    rng.feed(serialize_u8_vec(buf3))
    out.append(fr_rand(rng))
    return out


def test_deterministic_pseudorandom_generator():
    rnd = random.Random(123)
    for _ in range(3):
        msgs = [bytes(rnd.randrange(256) for _ in range(128)) for _ in range(7)]
        ref = _rw_sequence(Blake2b512Rng.setup(), msgs)
        for _ in range(5):
            assert _rw_sequence(Blake2b512Rng.setup(), msgs) == ref


def test_fill_bytes_block_chaining():
    """Pin the exact absorb/squeeze schedule of the reference `fill_bytes`
    (`rng.rs:61-80`), including the 64-byte-aligned double-absorb corner."""
    import hashlib

    r = Blake2b512Rng.setup()
    r.feed(b"x")
    got = r.fill_bytes(64)

    # manual model: running digest h; block = H(state); 64 bytes consumed ->
    # absorb block, regenerate, absorb the fresh (unconsumed) block at exit
    h = hashlib.blake2b(b"x", digest_size=64)
    block1 = h.copy().digest()
    assert got == block1
    h.update(block1)
    block2 = h.copy().digest()
    h.update(block2)
    # next sample must continue from state h
    r2 = Blake2b512Rng.setup()
    r2.feed(b"x")
    r2.fill_bytes(64)
    assert r2.fill_bytes(8) == h.copy().digest()[:8]


def test_fill_bytes_partial_block():
    import hashlib

    r = Blake2b512Rng.setup()
    got = r.fill_bytes(10)
    h = hashlib.blake2b(digest_size=64)
    block = h.copy().digest()
    assert got == block[:10]
    # partial block still absorbed once at exit
    h.update(block)
    assert r.fill_bytes(4) == h.copy().digest()[:4]


def test_next_u64_independent_calls():
    """Each next_u64 is a separate fill_bytes(8) call (separate absorb)."""
    a = Blake2b512Rng.setup()
    u0, u1 = a.next_u64(), a.next_u64()
    assert u0 != u1
    b = Blake2b512Rng.setup()
    assert int.from_bytes(b.fill_bytes(8), "little") == u0
    assert int.from_bytes(b.fill_bytes(8), "little") == u1


def test_fr_rand_montgomery_semantics():
    """The accepted 255-bit draw is the Montgomery representation
    (ark-ff `Distribution<Fp> for Standard`)."""
    rng = Blake2b512Rng.setup()
    rng.feed(b"seed")
    # re-derive by hand
    probe = Blake2b512Rng.setup()
    probe.feed(b"seed")
    limbs = [probe.next_u64() for _ in range(4)]
    limbs[3] &= (1 << 63) - 1
    mont = limbs[0] | limbs[1] << 64 | limbs[2] << 128 | limbs[3] << 192
    expect = (mont * R_INV) % P if mont < P else None
    got = fr_rand(rng)
    if expect is not None:
        assert got == expect


def test_serialization_formats():
    assert serialize_usize(5) == (5).to_bytes(8, "little")
    assert serialize_fr(Fr(1)) == (1).to_bytes(32, "little")
    assert serialize_fr(Fr(P - 1)) == (P - 1).to_bytes(32, "little")
    v = serialize_fr_vec([Fr(1), Fr(2)])
    assert v[:8] == (2).to_bytes(8, "little") and len(v) == 8 + 64
    from sumcheck_tpu.data_structures import PolynomialInfo

    info = PolynomialInfo(3, 7)
    assert info.serialize_uncompressed() == (3).to_bytes(8, "little") + (7).to_bytes(8, "little")
    from sumcheck_tpu.protocol.prover import ProverMsg

    pm = ProverMsg([Fr(9), Fr(10), Fr(11)])
    b = pm.serialize_uncompressed()
    assert b[:8] == (3).to_bytes(8, "little") and b[8:40] == (9).to_bytes(32, "little")
