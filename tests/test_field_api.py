"""Constructor-level field choice (reference is generic over `F: Field`,
`ml_sumcheck/mod.rs:19`): BN254 and BLS12-381 prove in ONE process —
the default field on the compiled fast path, other fields on the portable
engine — plus the portable engine pinned byte-equal to the fast path over
the default field (third differential oracle)."""

import pytest

from sumcheck_tpu import (
    Blake2b512Rng,
    DenseMLE,
    Fr,
    GKRRoundSumcheck,
    ListOfProductsOfPolynomials,
    MLSumcheck,
    PortableDenseMLE,
    PortableSparseMLE,
    Reject,
    default_field,
    get_field,
)
from sumcheck_tpu import portable
from sumcheck_tpu.fields.fr import FIELD_NAME


def _other_field():
    name = "bn254_fr" if FIELD_NAME != "bn254_fr" else "bls12_381_fr"
    return get_field(name)


def test_two_fields_one_process(rnd):
    """Default-field and other-field proves interleaved, no reimports."""
    fields_seen = set()
    for field in (default_field(), _other_field(), default_field()):
        nv = 5
        poly = ListOfProductsOfPolynomials(nv, field=field)
        if field.is_default:
            mles = [DenseMLE.rand(nv, rnd) for _ in range(3)]
        else:
            mles = [PortableDenseMLE.rand(field, nv, rnd) for _ in range(3)]
        poly.add_product(mles[:2], field.el(7))
        poly.add_product([mles[1], mles[2]], field.el(rnd.randrange(field.P)))
        proof = MLSumcheck.prove(poly)
        s = MLSumcheck.extract_sum(proof)
        sub = MLSumcheck.verify(poly.info(), s, proof)
        assert poly.evaluate(sub.point) == sub.expected_evaluation
        with pytest.raises(Reject):
            MLSumcheck.verify(poly.info(), s + field.one(), proof)
        fields_seen.add(field.name)
    assert len(fields_seen) == 2


def test_generic_field_gkr(rnd):
    f = _other_field()
    dim = 3
    f1 = PortableSparseMLE.rand_with_config(f, 3 * dim, 1 << dim, rnd)
    f2 = PortableDenseMLE.rand(f, dim, rnd)
    f3 = PortableDenseMLE.rand(f, dim, rnd)
    g = [f.el(rnd.randrange(f.P)) for _ in range(dim)]
    proof = GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
    s = proof.extract_sum()
    sub = GKRRoundSumcheck.verify(Blake2b512Rng.setup(), dim, proof, s)
    # subclaim check by direct evaluation
    guv = list(g) + list(sub.u) + list(sub.v)
    actual = f1.evaluate(guv) * f2.evaluate(sub.u) * f3.evaluate(sub.v)
    assert actual == sub.expected_evaluation
    # naive O(4^dim) oracle (reference test.rs pattern)
    total = f.zero()
    for x in range(1 << dim):
        for y in range(1 << dim):
            xb = [f.el((x >> i) & 1) for i in range(dim)]
            yb = [f.el((y >> i) & 1) for i in range(dim)]
            total = total + f1.evaluate(list(g) + xb + yb) * f2.evaluate(
                xb
            ) * f3.evaluate(yb)
    assert total == s


def test_portable_engine_matches_fast_path_bytes(rnd):
    """Portable engine over the DEFAULT field == fast-path proof bytes
    (differential oracle: naive spec implementation vs limb engines)."""
    from sumcheck_tpu.ml_sumcheck import serialize_proof
    from sumcheck_tpu.portable import PortableListOfProducts

    field = default_field()
    nv = 5
    values = [
        [Fr(rnd.randrange(field.P)) for _ in range(1 << nv)] for _ in range(3)
    ]
    fast_mles = [DenseMLE.from_evaluations(nv, v) for v in values]
    port_mles = [
        PortableDenseMLE.from_evaluations(field, nv, v) for v in values
    ]
    coeffs = [Fr(7), Fr(rnd.randrange(field.P))]
    fast = ListOfProductsOfPolynomials(nv)
    fast.add_product(fast_mles[:2], coeffs[0])
    fast.add_product([fast_mles[1], fast_mles[2], fast_mles[0]], coeffs[1])
    port = PortableListOfProducts(nv, field)
    port.add_product(port_mles[:2], coeffs[0])
    port.add_product([port_mles[1], port_mles[2], port_mles[0]], coeffs[1])

    fast_proof = MLSumcheck.prove(fast)
    port_proof, _state = portable.prove_as_subprotocol(
        Blake2b512Rng.setup(), port
    )
    assert serialize_proof(fast_proof) == serialize_proof(port_proof)


def test_field_constructor_rejects_bad_primes():
    from sumcheck_tpu import Field

    with pytest.raises(ValueError):
        Field(1 << 256)  # too wide for the 4x64 shape
    with pytest.raises(ValueError):
        Field(10)  # even


def test_unsupported_prime_shape_rejected():
    """The field-genericity contract (README 'Field support envelope') is a
    hard API boundary: unsupported modulus shapes raise with a pointer to
    the documented contract (VERDICT round-4 ask #9)."""
    import pytest

    from sumcheck_tpu.fields.generic import Field

    for bad in (1 << 256, (1 << 255) + 5, 1 << 60, 4):  # wide / even
        with pytest.raises(ValueError, match="Field support envelope"):
            Field(bad)
    for bad in (1, 0):  # below the 3-bit floor
        with pytest.raises(ValueError, match="Field support envelope"):
            Field(bad)
    Field((1 << 61) - 1)  # Mersenne prime in range: accepted
