"""Field-choice config: SUMCHECK_TPU_FIELD selects the process-wide prime
(SURVEY.md §5 "config: field choice"). The reference is generic over
`F: Field` at the type level; here the field is a compile-time constant set
baked into every kernel, switched per process. BN254 Fr exercises a
different modulus, bit length (254 -> num_bits_to_shave == 2), and
Montgomery constants through the full prove/verify stack."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

_CHILD = r"""
import json, random, sys

import jax

jax.config.update("jax_platforms", "cpu")

from sumcheck_tpu import (
    Blake2b512Rng, DenseMLE, Fr, GKRRoundSumcheck,
    ListOfProductsOfPolynomials, MLSumcheck, SparseMLE,
)
from sumcheck_tpu.fields.fr import FIELD_NAME, MODULUS_BITS, P, SHAVE_BITS
from sumcheck_tpu.fields import limbs_np as L

assert FIELD_NAME == "bn254_fr" and MODULUS_BITS == 254 and SHAVE_BITS == 2
assert P == %(r)d

# host field arithmetic vs ints
rnd = random.Random(3)
for _ in range(50):
    a, b = rnd.randrange(P), rnd.randrange(P)
    assert (Fr(a) * Fr(b)).v == a * b %% P
    assert (Fr(a) - Fr(b)).v == (a - b) %% P
    assert (Fr(a).inverse() * Fr(a)).v == 1

# limb kernels vs ints (Montgomery round-trip through mont_mul)
xs = [rnd.randrange(P) for _ in range(64)]
ys = [rnd.randrange(P) for _ in range(64)]
zm = L.mont_mul(L.from_ints(xs), L.from_ints(ys))  # mont in, mont out
got = L.to_ints(zm)  # converts back out of Montgomery form
assert got == [x * y %% P for x, y in zip(xs, ys)]

# MLSumcheck round-trip with brute-force ground truth
nv = 5
poly = ListOfProductsOfPolynomials(nv)
m = [DenseMLE.rand(nv, rnd) for _ in range(3)]
poly.add_product([m[0], m[1]], Fr(rnd.randrange(1, P)))
poly.add_product([m[1], m[2]], Fr(rnd.randrange(1, P)))
proof = MLSumcheck.prove(poly)
true_sum = Fr.zero()
for b in range(1 << nv):
    true_sum = true_sum + poly.evaluate([Fr((b >> i) & 1) for i in range(nv)])
assert MLSumcheck.extract_sum(proof) == true_sum
sub = MLSumcheck.verify(poly.info(), true_sum, proof)
assert poly.evaluate(sub.point) == sub.expected_evaluation

# device chained path (limbs_jnp + device Blake2b under the new constants)
from sumcheck_tpu.ml_sumcheck import serialize_proof
from sumcheck_tpu.utils.config import get_config

cfg = get_config()
cfg.engine, cfg.chained, cfg.chain_impl = "device", "on", "generic"
dproof = MLSumcheck.prove(poly)
assert serialize_proof(dproof) == serialize_proof(proof), "device != host"

# sharded path (replicated device transcript + psum under new constants)
from sumcheck_tpu.parallel.chained import ChainedShardedProver

sproof = ChainedShardedProver.auto(4).prove(poly)
assert serialize_proof(sproof) == serialize_proof(proof), "sharded != host"
cfg.engine = "host"

# GKR round-trip
dim = 3
f2, f3 = DenseMLE.rand(dim, rnd), DenseMLE.rand(dim, rnd)
f1 = SparseMLE.rand_with_config(3 * dim, 1 << dim, rnd)
g = [Fr(rnd.randrange(P)) for _ in range(dim)]
gp = GKRRoundSumcheck.prove(Blake2b512Rng.setup(), f1, f2, f3, g)
gs = GKRRoundSumcheck.verify(Blake2b512Rng.setup(), dim, gp, gp.extract_sum())
assert gs.verify_subclaim(f1, f2, f3, g)

# transcript determinism + rejection sampling stays in-field
r1, r2 = Blake2b512Rng.setup(), Blake2b512Rng.setup()
r1.feed(poly.info()); r2.feed(poly.info())
for _ in range(8):
    a, b = Fr.rand(r1), Fr.rand(r2)
    assert a == b and 0 <= a.v < P
print(json.dumps({"ok": True}))
"""


@pytest.mark.slow
def test_bn254_field_end_to_end():
    env = dict(os.environ)
    env["SUMCHECK_TPU_FIELD"] = "bn254_fr"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"r": _BN254_R}],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1]) == {"ok": True}


def test_default_field_unchanged():
    from sumcheck_tpu.fields.fr import FIELD_NAME, MODULUS_BITS, P, SHAVE_BITS

    assert FIELD_NAME == "bls12_381_fr" and MODULUS_BITS == 255
    assert SHAVE_BITS == 1
    assert P == 52435875175126190479447740508185965837690552500527637822603658699938581184513
