"""Hypercube sharding over a device mesh — the distribution layer the
reference lacks (SURVEY.md §2: its only parallelism is rayon chunking of the
hypercube, `prover.rs:110,138-148`; the fold-then-reduce shape is exactly a
per-shard partial sum + allreduce).

Layout: the 2^nv hypercube is sharded on the **high-order** reference index
bits (the variables folded *last*), so the per-round pairwise fold of variable
0 — `(T[2b], T[2b+1])`, low bit — never crosses a shard boundary. Within each
shard, entries are bit-reversed (see `protocol/prover.py`), making the fold a
contiguous first-half/second-half operation locally.

Global device position of reference index b (nv bits, k = log2(num_shards)):
    s = b >> (nv-k)              (shard id: top k bits, natural order)
    w = bitrev_{nv-k}(b & mask)  (position within shard)
    pos = s * 2^(nv-k) + w
which is an array of shape (16, U+1, 2^nv) sharded along its last axis.

Per round, each shard computes its partial (d+1) wide digit sums and a
`lax.psum` over the mesh axis produces the exact totals — field addition is
exact integer addition of strict wide digits (each < 2^16), so a psum over up
to 2^16 shards cannot overflow uint32 and reduction order is irrelevant for
bit-exactness. Once the local table is down to one lane per shard (or below
the host threshold), the tiny tail moves to the host engine.
"""

from __future__ import annotations

import functools

import numpy as np

from ..protocol.prover import bitrev_perm


@functools.lru_cache(maxsize=None)
def sharded_perm(nv: int, k: int) -> np.ndarray:
    """Permutation q with q[b] = global device position of reference index b
    under k-bit sharding (an involution is NOT guaranteed here; use
    `inverse_sharded_perm` to go back)."""
    assert 0 <= k <= nv
    b = np.arange(1 << nv, dtype=np.int64)
    lo_bits = nv - k
    s = b >> lo_bits
    lo = b & ((1 << lo_bits) - 1)
    w = bitrev_perm(lo_bits)[lo]
    return (s << lo_bits) | w


@functools.lru_cache(maxsize=None)
def inverse_sharded_perm(nv: int, k: int) -> np.ndarray:
    perm = sharded_perm(nv, k)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=np.int64)
    return inv


def to_sharded_layout(evals_mont: np.ndarray, nv: int, k: int) -> np.ndarray:
    """Natural-order host digit table (..., 2^nv) -> shard-blocked bitrev."""
    out = np.empty_like(evals_mont)
    out[..., sharded_perm(nv, k)] = evals_mont
    return out


def from_sharded_layout(arr: np.ndarray, nv: int, k: int) -> np.ndarray:
    """Shard-blocked bitrev layout (..., 2^nv) -> natural-order table."""
    return arr[..., sharded_perm(nv, k)]


def default_mesh(num_devices: int | None = None):
    """A 1-D `jax.sharding.Mesh` over the first `num_devices` devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("x",))
