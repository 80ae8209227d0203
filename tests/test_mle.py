"""Multilinear extension tests: fix_variables/evaluate semantics vs naive
multilinear extension formula, sparse/dense agreement, interpolation."""



from sumcheck_tpu import DenseMLE, Fr, SparseMLE
from sumcheck_tpu.fields.fr import P
from sumcheck_tpu.protocol.verifier import interpolate_uni_poly


def naive_mle_eval(table: list[Fr], point: list[Fr]) -> Fr:
    """sum_b table[b] * prod_i (b_i ? x_i : 1-x_i)."""
    nv = len(point)
    total = Fr.zero()
    for b in range(len(table)):
        w = Fr.one()
        for i in range(nv):
            w = w * (point[i] if (b >> i) & 1 else Fr.one() - point[i])
        total = total + table[b] * w
    return total


def test_dense_evaluate_matches_naive(rnd):
    nv = 4
    vals = [Fr(rnd.randrange(P)) for _ in range(1 << nv)]
    mle = DenseMLE.from_evaluations(nv, vals)
    for _ in range(3):
        pt = [Fr(rnd.randrange(P)) for _ in range(nv)]
        assert mle.evaluate(pt) == naive_mle_eval(vals, pt)
    # boolean points recover the table
    for b in [0, 3, 7, 15]:
        pt = [Fr((b >> i) & 1) for i in range(nv)]
        assert mle.evaluate(pt) == vals[b]


def test_fix_variables_low_bit_first(rnd):
    """fix_variables folds variable 0 (the LOW index bit) first:
    new[b] = old[2b] + r*(old[2b+1]-old[2b])."""
    nv = 3
    vals = [Fr(rnd.randrange(P)) for _ in range(1 << nv)]
    mle = DenseMLE.from_evaluations(nv, vals)
    r = Fr(rnd.randrange(P))
    fixed = mle.fix_variables([r])
    assert fixed.num_vars == nv - 1
    for b in range(1 << (nv - 1)):
        expect = vals[2 * b] + r * (vals[2 * b + 1] - vals[2 * b])
        assert fixed[b] == expect


def test_fix_all_equals_evaluate(rnd):
    nv = 4
    mle = DenseMLE.rand(nv, rnd)
    pt = [Fr(rnd.randrange(P)) for _ in range(nv)]
    assert mle.fix_variables(pt)[0] == mle.evaluate(pt)


def test_scaled_add(rnd):
    nv = 3
    a = DenseMLE.rand(nv, rnd)
    b = DenseMLE.rand(nv, rnd)
    c = Fr(rnd.randrange(P))
    s = a.scaled_add(c, b)
    al, bl, sl = a.to_fr_list(), b.to_fr_list(), s.to_fr_list()
    for i in range(1 << nv):
        assert sl[i] == al[i] + c * bl[i]
    # zero() += (c, b) adopts b's num_vars (the reference GKR pattern)
    z = DenseMLE.zero().scaled_add(c, b)
    assert z.num_vars == nv
    assert z.to_fr_list() == [c * x for x in bl]


def test_sparse_dense_agree(rnd):
    nv = 4
    sp = SparseMLE.rand_with_config(nv, 5, rnd)
    de = sp.to_dense()
    pt = [Fr(rnd.randrange(P)) for _ in range(nv)]
    assert sp.evaluate(pt) == de.evaluate(pt)
    k = 2
    partial = pt[:k]
    sp_fixed = sp.fix_variables(partial).to_dense()
    de_fixed = de.fix_variables(partial)
    assert sp_fixed.to_fr_list() == de_fixed.to_fr_list()


def test_sparse_duplicate_merge(rnd):
    """fix_variables must merge entries whose shifted indices collide."""
    nv = 3
    sp = SparseMLE.from_pairs(nv, [(0, Fr(5)), (1, Fr(7)), (2, Fr(11)), (7, Fr(13))])
    de = sp.to_dense()
    r = Fr(rnd.randrange(P))
    sp_fixed = sp.fix_variables([r]).to_dense()
    de_fixed = de.fix_variables([r])
    assert sp_fixed.to_fr_list() == de_fixed.to_fr_list()


def test_interpolate_uni_poly(rnd):
    """Reference `verifier.rs:283-333`: vs naive Lagrange at degrees spanning
    the reference's three factorial branches, plus integer-point early
    returns."""

    def naive(pts, x):
        n = len(pts)
        res = Fr.zero()
        for i in range(n):
            term = pts[i]
            for j in range(n):
                if j != i:
                    term = term * (x - Fr(j)) / (Fr(i) - Fr(j))
            res = res + term
        return res

    for n in [2, 3, 13, 20, 33, 64]:
        pts = [Fr(rnd.randrange(P)) for _ in range(n)]
        x = Fr(rnd.randrange(P))
        assert interpolate_uni_poly(pts, x) == naive(pts, x)
        for k in [0, 1, n - 1]:
            assert interpolate_uni_poly(pts, Fr(k)) == pts[k]
    # the reference's doc example: squares through (0,0),(1,1),(2,4),(3,9)
    evals = [Fr(0), Fr(1), Fr(4), Fr(9)]
    assert interpolate_uni_poly(evals, Fr(3)) == Fr(9)


def test_bitrev_roundtrip():
    import numpy as np

    from sumcheck_tpu.protocol.prover import bitrev_perm, to_bitrev

    for nv in [1, 2, 5]:
        perm = bitrev_perm(nv)
        assert (perm[perm] == np.arange(1 << nv)).all()  # involution
    arr = np.arange(16 * 8, dtype=np.uint32).reshape(16, 8)
    assert (to_bitrev(to_bitrev(arr, 3), 3) == arr).all()
