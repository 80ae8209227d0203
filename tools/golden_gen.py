#!/usr/bin/env python3
"""Cleanroom golden-vector generator for the sumcheck fixtures.

PROVENANCE / INDEPENDENCE STATEMENT
-----------------------------------
This script is a from-scratch SECOND implementation of the arkworks sumcheck
byte pipeline, written to generate external regression fixtures for
`tests/fixtures/`. It deliberately shares NO code, layout, or math style with
the `sumcheck_tpu` package:

- field arithmetic: plain Python ints mod p (no Montgomery form, no limbs);
- hashing: `hashlib.blake2b` (CPython's vendored RFC 7693 implementation);
- prover math: naive O(2^nv * (d+1)) per-round evaluation in the NATURAL
  (non-bit-reversed) table layout with adjacent pairs (2b, 2b+1), per-product
  table copies (no dedup), direct `start + t*step` evaluation;
- serialization: composed inline from the ark-serialize rules cited below.

The Rust reference crate itself cannot be executed in this environment (no
Rust toolchain, no network), so these fixtures are NOT produced by arkworks
binaries. They are the closest available external check: an independent
implementation of the same byte-level conventions, derived from:

- transcript semantics: /root/reference/src/rng.rs:30-81 (running Blake2b512
  digest; `feed` = absorb `serialize_uncompressed` bytes; `fill_bytes` =
  finalize-a-clone, copy bytes, re-absorb each fully- or partially-consumed
  64-byte output block at the end);
- Fr canonical serialization: ark-serialize/ark-ff 0.4 `Fp::serialize_with_mode`
  = 32 little-endian bytes of the canonical (non-Montgomery) residue
  (`into_bigint().to_bytes_le()`), no flag bits for a 255-bit modulus;
- `Vec<T>` serialization: u64 little-endian length prefix, then elements
  (ark-serialize 0.4 sequence impl);
- derived-struct serialization: fields in declaration order
  (`PolynomialInfo { max_multiplicands, num_variables }`,
  /root/reference/src/ml_sumcheck/data_structures.rs:47-55; usize -> u64 LE);
- `Fr::rand`: ark-ff 0.4 `Distribution<Fp> for Standard`: draw N=4 u64 limbs
  low-to-high via `Rng::gen::<u64>()` (= `next_u64`, 8 LE bytes of
  `fill_bytes`), mask the top limb down to MODULUS_BITS = 255 (shave 1 bit),
  reject and retry if >= p. The accepted bigint is used as the MONTGOMERY
  representation directly (`Fp::new_unchecked`), so the canonical value is
  draw * R^{-1} mod p with R = 2^256.
- protocol schedule: /root/reference/src/ml_sumcheck/mod.rs:50-70 (feed info,
  then per round feed ProverMsg / sample challenge) and
  /root/reference/src/gkr_round_sumcheck/mod.rs:93-139 (GKR feeds ONLY the
  prover messages; two phases of `dim` rounds each).

Output: JSON fixtures under tests/fixtures/ (hex-encoded byte strings).
Run: python tools/golden_gen.py
"""

from __future__ import annotations

import hashlib
import json
import os

# BLS12-381 scalar field modulus (public parameter; see e.g. the BLS12-381
# specification / IETF pairing-friendly-curves draft, "r").
P = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
R_INV = pow(1 << 256, -1, P)  # R = 2^256 (4 x u64 limbs)

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


# --------------------------------------------------------------------------
# Transcript (re-derivation of /root/reference/src/rng.rs:30-81)
# --------------------------------------------------------------------------
class Transcript:
    def __init__(self) -> None:
        self.digest = hashlib.blake2b(digest_size=64)

    def feed_bytes(self, data: bytes) -> None:
        self.digest.update(data)

    def fill_bytes(self, n: int) -> bytes:
        out = bytearray()
        block = self.digest.copy().digest()
        ptr = 0
        while len(out) < n:
            out.append(block[ptr])
            ptr += 1
            if ptr == 64:
                self.digest.update(block)
                block = self.digest.copy().digest()
                ptr = 0
        self.digest.update(block)
        return bytes(out)

    def next_u64(self) -> int:
        return int.from_bytes(self.fill_bytes(8), "little")


def fr_rand(t: Transcript) -> int:
    """ark-ff 0.4 UniformRand over the transcript; returns the CANONICAL
    residue (the raw accepted draw is the Montgomery representation)."""
    while True:
        limbs = [t.next_u64() for _ in range(4)]
        limbs[3] &= (1 << 63) - 1  # shave 64*4 - 255 = 1 bit off the top limb
        draw = sum(w << (64 * i) for i, w in enumerate(limbs))
        if draw < P:
            return draw * R_INV % P


# --------------------------------------------------------------------------
# Serialization (ark-serialize 0.4 uncompressed rules)
# --------------------------------------------------------------------------
def ser_u64(x: int) -> bytes:
    return x.to_bytes(8, "little")


def ser_fr(x: int) -> bytes:
    return x.to_bytes(32, "little")


def ser_fr_vec(v: list[int]) -> bytes:
    return ser_u64(len(v)) + b"".join(ser_fr(x) for x in v)


def ser_info(max_multiplicands: int, num_variables: int) -> bytes:
    return ser_u64(max_multiplicands) + ser_u64(num_variables)


def ser_proof(msgs: list[list[int]]) -> bytes:
    """Vec<ProverMsg> where ProverMsg { evaluations: Vec<F> }."""
    return ser_u64(len(msgs)) + b"".join(ser_fr_vec(m) for m in msgs)


# --------------------------------------------------------------------------
# Deterministic instance data (documented rule; inputs, not claims)
# --------------------------------------------------------------------------
def table_val(tag: str, i: int) -> int:
    h = hashlib.blake2b(f"sumcheck-golden/{tag}/{i}".encode(), digest_size=32)
    return int.from_bytes(h.digest(), "little") % P


def gen_table(tag: str, nv: int) -> list[int]:
    return [table_val(tag, i) for i in range(1 << nv)]


# --------------------------------------------------------------------------
# Naive MLSumcheck prover (natural layout, adjacent pairs, no dedup)
# --------------------------------------------------------------------------
def ml_prove(nv: int, products: list[tuple[int, list[list[int]]]], transcript=None, feed_info=True):
    """products: [(coeff, [table, ...])]. Returns (msgs, challenges, transcript).

    Per-round math mirrors the protocol definition only: the round polynomial
    at t is sum_products coeff * sum_b prod_j (f_j[2b] + t*(f_j[2b+1]-f_j[2b]));
    fold is f'[b] = f[2b] + r*(f[2b+1]-f[2b])."""
    d = max(len(tabs) for _, tabs in products)
    t = transcript if transcript is not None else Transcript()
    if feed_info:
        t.feed_bytes(ser_info(d, nv))
    cur = [(c, [list(tb) for tb in tabs]) for c, tabs in products]
    msgs, challenges = [], []
    for _ in range(nv):
        evals = []
        for tv in range(d + 1):
            s = 0
            for coeff, tabs in cur:
                half = len(tabs[0]) // 2
                for b in range(half):
                    prod = coeff
                    for tb in tabs:
                        prod = prod * ((tb[2 * b] + tv * (tb[2 * b + 1] - tb[2 * b])) % P) % P
                    s = (s + prod) % P
            evals.append(s)
        msgs.append(evals)
        t.feed_bytes(ser_fr_vec(evals))
        r = fr_rand(t)
        challenges.append(r)
        cur = [
            (c, [[(tb[2 * b] + r * (tb[2 * b + 1] - tb[2 * b])) % P for b in range(len(tb) // 2)]
                 for tb in tabs])
            for c, tabs in cur
        ]
    final_eval = sum(c * _prod1(tabs) for c, tabs in cur) % P
    return msgs, challenges, final_eval, t


def _prod1(tabs) -> int:
    v = 1
    for tb in tabs:
        assert len(tb) == 1
        v = v * tb[0] % P
    return v


def ml_sum(products) -> int:
    s = 0
    for coeff, tabs in products:
        for b in range(len(tabs[0])):
            prod = coeff
            for tb in tabs:
                prod = prod * tb[b] % P
            s = (s + prod) % P
    return s


# --------------------------------------------------------------------------
# Naive GKR round sumcheck (all-dense math; fix-first-variables convention)
# --------------------------------------------------------------------------
def eq_weight(bits_index: int, point: list[int], k: int) -> int:
    w = 1
    for j in range(k):
        bit = (bits_index >> j) & 1
        w = w * (point[j] if bit else (1 - point[j]) % P) % P
    return w


def fix_first_vars_dense(table: list[int], nv: int, point: list[int]) -> list[int]:
    """f(point, x_rest): fix the FIRST k variables (low index bits)."""
    k = len(point)
    out = [0] * (1 << (nv - k))
    for idx, v in enumerate(table):
        if v == 0:
            continue
        out[idx >> k] = (out[idx >> k] + v * eq_weight(idx & ((1 << k) - 1), point, k)) % P
    return out


def gkr_prove(dim: int, f1_nonzeros: dict[int, int], f2: list[int], f3: list[int], g: list[int]):
    """Reference GKRRoundSumcheck::prove (mod.rs:93-139), all-dense math.

    f1 is over 3*dim variables with g the first dim (low bits), x next, y high.
    Transcript feeds ONLY prover messages (no info, no g, no claimed sum)."""
    f1_dense = [0] * (1 << (3 * dim))
    for idx, v in f1_nonzeros.items():
        f1_dense[idx] = v % P
    f1_g = fix_first_vars_dense(f1_dense, 3 * dim, g)  # over (x, y), x low
    # h_g(x) = sum_y f1_g[x + (y << dim)] * f3[y]
    h_g = [0] * (1 << dim)
    for x in range(1 << dim):
        acc = 0
        for y in range(1 << dim):
            acc = (acc + f1_g[x + (y << dim)] * f3[y]) % P
        h_g[x] = acc
    t = Transcript()
    phase1_msgs, u, _, t = ml_prove(dim, [(1, [h_g, list(f2)])], transcript=t, feed_info=False)
    f1_gu = fix_first_vars_dense(f1_g, 2 * dim, u)  # over y
    f2_u = fix_first_vars_dense(list(f2), dim, u)[0]
    f3_scaled = [f2_u * v % P for v in f3]
    phase2_msgs, v, _, t = ml_prove(dim, [(1, [f1_gu, f3_scaled])], transcript=t, feed_info=False)
    # claimed sum and final evaluation for verify cross-checks
    claimed = 0
    for x in range(1 << dim):
        claimed = (claimed + h_g[x] * f2[x]) % P
    f1_guv = fix_first_vars_dense(f1_gu, dim, v)[0]
    f3_v = fix_first_vars_dense(list(f3), dim, v)[0]
    expected = f1_guv * f2_u % P * f3_v % P
    return phase1_msgs, phase2_msgs, u, v, claimed, expected


# --------------------------------------------------------------------------
# Fixture emission
# --------------------------------------------------------------------------
def hx(b: bytes) -> str:
    return b.hex()


def fr_hex(x: int) -> str:
    return format(x, "064x")


def fixture_transcript() -> dict:
    """Interleaved feed / next_u64 / Fr draw schedule with raw byte feeds."""
    t = Transcript()
    ops = []
    feeds = [b"", b"\x00", b"arkworks sumcheck golden", bytes(range(64)), bytes(range(200))]
    for i, fb in enumerate(feeds):
        t.feed_bytes(fb)
        ops.append({"op": "feed_bytes", "data": hx(fb)})
        u = t.next_u64()
        ops.append({"op": "next_u64", "value": u})
        if i % 2 == 0:
            r = fr_rand(t)
            ops.append({"op": "fr_rand", "canonical": fr_hex(r)})
    ops.append({"op": "fill_bytes", "n": 127, "data": hx(t.fill_bytes(127))})
    ops.append({"op": "fill_bytes", "n": 128, "data": hx(t.fill_bytes(128))})
    ops.append({"op": "fr_rand", "canonical": fr_hex(fr_rand(t))})
    return {"description": "feed/sample schedule vs reference rng.rs:30-81", "ops": ops}


def fixture_fr_rand() -> dict:
    """Fr draws from a transcript seeded with fixed bytes — pins the
    ark-ff UniformRand convention (LSW-first u64s, 1-bit shave, draw is the
    Montgomery form)."""
    t = Transcript()
    t.feed_bytes(b"fr_rand fixture seed")
    draws = [fr_hex(fr_rand(t)) for _ in range(16)]
    return {"seed_feed": hx(b"fr_rand fixture seed"), "draws_canonical": draws}


def fixture_ml(name: str, nv: int, spec: list[tuple[int, list[str]]], shared: dict[str, list[int]]) -> dict:
    products = [(c, [shared[tag] for tag in tags]) for c, tags in spec]
    msgs, challenges, final_eval, _ = ml_prove(nv, products)
    asserted = ml_sum(products)
    proof = ser_proof(msgs)
    return {
        "name": name,
        "nv": nv,
        "max_multiplicands": max(len(tags) for _, tags in spec),
        "products": [{"coeff": fr_hex(c), "tables": tags} for c, tags in spec],
        "table_rule": "table[tag][i] = blake2b-256('sumcheck-golden/{tag}/{i}') LE mod p",
        "asserted_sum": fr_hex(asserted),
        "info_bytes": hx(ser_info(max(len(tags) for _, tags in spec), nv)),
        "proof_bytes": hx(proof),
        "challenges": [fr_hex(r) for r in challenges],
        "final_evaluation": fr_hex(final_eval),
    }


def fixture_gkr(dim: int) -> dict:
    nnz = 1 << dim
    f1_nonzeros = {}
    i = 0
    while len(f1_nonzeros) < nnz:
        idx = table_val(f"gkr{dim}/f1idx", i) % (1 << (3 * dim))
        if idx not in f1_nonzeros:
            f1_nonzeros[idx] = table_val(f"gkr{dim}/f1val", i)
        i += 1
    f2 = gen_table(f"gkr{dim}/f2", dim)
    f3 = gen_table(f"gkr{dim}/f3", dim)
    g = [table_val(f"gkr{dim}/g", j) for j in range(dim)]
    p1, p2, u, v, claimed, expected = gkr_prove(dim, f1_nonzeros, f2, f3, g)
    return {
        "dim": dim,
        "f1_nonzeros": {str(k): fr_hex(val) for k, val in sorted(f1_nonzeros.items())},
        "table_rule": "see fixture_gkr in tools/golden_gen.py (blake2b-based)",
        "g": [fr_hex(x) for x in g],
        "phase1_msgs": [[fr_hex(x) for x in m] for m in p1],
        "phase2_msgs": [[fr_hex(x) for x in m] for m in p2],
        "u": [fr_hex(x) for x in u],
        "v": [fr_hex(x) for x in v],
        "claimed_sum": fr_hex(claimed),
        "expected_evaluation": fr_hex(expected),
    }


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)

    fixtures = {
        "transcript.json": fixture_transcript(),
        "fr_rand.json": fixture_fr_rand(),
        # BASELINE.json config 1: product of 2 multilinears, nv=14
        "ml_nv14_config1.json": fixture_ml(
            "config1", 14, [(1, ["a", "b"])],
            {"a": gen_table("nv14/a", 14), "b": gen_table("nv14/b", 14)},
        ),
        # rich small instance: shared table, ragged products, coefficients
        "ml_nv6_rich.json": fixture_ml(
            "rich", 6,
            [
                (table_val("rich/c0", 0), ["s", "t0", "t1"]),
                (table_val("rich/c1", 0), ["s", "t2"]),
                (1, ["t3", "t4", "s", "t0"]),
            ],
            {tag: gen_table(f"nv6/{tag}", 6) for tag in ["s", "t0", "t1", "t2", "t3", "t4"]},
        ),
        "gkr_dim5.json": fixture_gkr(5),
    }
    for fname, data in fixtures.items():
        path = os.path.join(OUT_DIR, fname)
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
