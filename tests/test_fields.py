"""Field layer tests: NumPy and JAX limb arithmetic vs Python-int ground
truth (SURVEY.md Stage 0 deliverable)."""

import random

import numpy as np
import pytest

from sumcheck_tpu.fields import limbs_np as L
from sumcheck_tpu.fields.fr import (
    DIGIT_BITS,
    Fr,
    NINV_FULL,
    NUM_DIGITS,
    P,
    R,
    R2,
    R_INV,
    from_mont,
    to_mont,
)

rnd = random.Random(0xF1E1D)
EDGE = [0, 1, 2, P - 1, P - 2, (P - 1) // 2, (P + 1) // 2, R % P, P - 0x10000]


def rand_elems(n):
    return [rnd.randrange(P) for _ in range(n)]


def test_constants():
    assert P % 2 == 1 and P.bit_length() == 255
    assert (R * R_INV) % P == 1
    assert R2 == (R * R) % P
    assert (P * NINV_FULL) % (1 << 256) == (1 << 256) - 1  # p * (-p^-1) == -1


def test_fr_scalar_ops():
    for _ in range(50):
        a, b = Fr(rnd.randrange(P)), Fr(rnd.randrange(P))
        assert (a + b).v == (a.v + b.v) % P
        assert (a - b).v == (a.v - b.v) % P
        assert (a * b).v == (a.v * b.v) % P
        if b.v:
            assert (a / b) * b == a
    assert Fr(5).inverse() * Fr(5) == Fr.one()
    assert (-Fr(5)).v == P - 5
    assert from_mont(to_mont(12345)) == 12345


def test_np_pack_roundtrip():
    xs = rand_elems(64) + EDGE
    arr = L.from_ints(xs)
    assert arr.dtype == np.uint32 and arr.shape == (NUM_DIGITS, len(xs))
    assert (arr >> DIGIT_BITS == 0).all()  # strict digits
    assert L.to_ints(arr) == xs
    raw = L.from_ints(xs, mont=False)
    assert L.to_ints(raw, mont=False) == xs


def test_np_arithmetic():
    xs = rand_elems(200) + EDGE
    ys = rand_elems(200) + list(reversed(EDGE))
    ax, ay = L.from_ints(xs), L.from_ints(ys)
    assert L.to_ints(L.add(ax, ay)) == [(x + y) % P for x, y in zip(xs, ys)]
    assert L.to_ints(L.sub(ax, ay)) == [(x - y) % P for x, y in zip(xs, ys)]
    assert L.to_ints(L.mont_mul(ax, ay)) == [(x * y) % P for x, y in zip(xs, ys)]
    assert L.to_ints(L.neg(ax)) == [(-x) % P for x in xs]


def test_np_sum_and_reduce_wide():
    xs = rand_elems(1000)
    ax = L.from_ints(xs)
    w = L.sum_lanes_wide(ax)  # (WIDE,)
    from sumcheck_tpu.fields.limbs_jnp import wide_to_int

    assert (wide_to_int(w) % P) * R_INV % P == sum(xs) % P
    # reduce_wide: the wide value mod p (still a sum of Montgomery residues)
    red = L.reduce_wide(w[:, None])
    assert L.to_ints(red, mont=True)[0] == sum(xs) % P


@pytest.mark.parametrize("shape", [(7,), (3, 5), (2, 3, 4)])
def test_jnp_matches_np(shape):
    import jax
    import jax.numpy as jnp

    from sumcheck_tpu.fields import limbs_jnp as LJ

    n = int(np.prod(shape))
    xs, ys = rand_elems(n), rand_elems(n)
    ax = L.from_ints(xs).reshape((NUM_DIGITS,) + shape)
    ay = L.from_ints(ys).reshape((NUM_DIGITS,) + shape)
    jx, jy = jnp.asarray(ax), jnp.asarray(ay)
    for name, npf, jf in [
        ("add", L.add, LJ.add),
        ("sub", L.sub, LJ.sub),
        ("mul", L.mont_mul, LJ.mont_mul),
    ]:
        got = np.asarray(jax.jit(jf)(jx, jy))
        exp = npf(ax, ay)
        assert (got == exp).all(), name


def test_jnp_edge_cases():
    import jax
    import jax.numpy as jnp

    from sumcheck_tpu.fields import limbs_jnp as LJ

    es = EDGE
    ae = jnp.asarray(L.from_ints(es))
    got = L.to_ints(np.asarray(jax.jit(LJ.mont_mul)(ae, ae)))
    assert got == [(e * e) % P for e in es]


def test_jnp_sum_lanes_wide_two_level():
    import jax
    import jax.numpy as jnp

    from sumcheck_tpu.fields import limbs_jnp as LJ

    xs = rand_elems(300)
    n = (1 << 16) + 37  # crosses the single-pass uint32 limit
    reps = -(-n // len(xs))
    big = np.tile(L.from_ints(xs), (1, reps))[:, :n]
    w = np.asarray(jax.jit(LJ.sum_lanes_wide)(jnp.asarray(big)))
    expected = sum(L.to_ints(big)) % P
    assert (LJ.wide_to_int(w) % P) * R_INV % P == expected


def test_mont_scalar_and_broadcast_mul():
    import jax
    import jax.numpy as jnp

    from sumcheck_tpu.fields import limbs_jnp as LJ

    xs = rand_elems(100)
    c = 987654321
    jx = jnp.asarray(L.from_ints(xs))
    jc = jnp.asarray(L.mont_scalar(c))
    got = L.to_ints(np.asarray(jax.jit(LJ.mont_mul)(jc, jx)))
    assert got == [(c * x) % P for x in xs]
