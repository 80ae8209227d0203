"""Test configuration: hermetic CPU backend with a virtual 8-device mesh.

Multi-chip sharding tests run on a simulated mesh
(`xla_force_host_platform_device_count`), the stand-in for real pod slices
(SURVEY.md §4 adaptation note). The engine threshold is lowered so the
device (JAX) round path gets exercised at small, fast-to-compile sizes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The persistent compile cache is DISABLED for tests: XLA:CPU executable
# (de)serialization in this container is unsound — deserializing
# cross-process entries reproducibly SEGFAULTED (round 2, 8-device
# sharded-GKR program) and round 4 caught a segfault in the WRITE path
# (zstd serialization inside put_executable_and_time) on the same
# program family. A per-run tempdir cache was tried first; since reads
# never hit within one run it was pure overhead plus the write-crash
# risk. In-process jit caching (what actually matters here) is unaffected.
# The TPU bench cache (.jax_cache) is unaffected — platform-keyed entries.
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob is
# honored. Without this, "CPU" tests silently run on the real chip.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
import random  # noqa: E402

from sumcheck_tpu import DenseMLE, Fr, ListOfProductsOfPolynomials  # noqa: E402
from sumcheck_tpu.fields.fr import P  # noqa: E402


@pytest.fixture
def rnd():
    return random.Random(0x5A5A)


def random_product(nv: int, num_multiplicands: int, rnd):
    """Build `num_multiplicands` random tables and the true product-sum while
    generating (mirrors reference `test.rs:15-43`)."""
    tables = [[rnd.randrange(P) for _ in range(1 << nv)] for _ in range(num_multiplicands)]
    s = 0
    for b in range(1 << nv):
        prod = 1
        for t in tables:
            prod = prod * t[b] % P
        s = (s + prod) % P
    return [DenseMLE.from_evaluations(nv, t) for t in tables], Fr(s)


def random_list_of_products(nv: int, num_multiplicands_range, num_products: int, rnd):
    """Aggregate random products with random coefficients
    (mirrors reference `test.rs:45-62`)."""
    total = Fr.zero()
    poly = ListOfProductsOfPolynomials(nv)
    for _ in range(num_products):
        m = rnd.randrange(num_multiplicands_range[0], num_multiplicands_range[1])
        mles, s = random_product(nv, m, rnd)
        coeff = Fr(rnd.randrange(P))
        poly.add_product(mles, coeff)
        total = total + s * coeff
    return poly, total
