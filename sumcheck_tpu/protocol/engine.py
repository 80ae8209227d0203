"""The round engine algorithm, written once over a pluggable limb backend.

`HOST` (NumPy, uint64 headroom) and `DEVICE` (JAX, uint32-only) expose the
same surface: `add`, `sub`, `mont_mul`, `sum_lanes_wide` on `(16, ...) uint32`
digit arrays. The prover picks a backend per round by table size
(`utils/config.py`): large tables amortize XLA compilation and run on TPU;
tail rounds (the table halves every round) run vectorized on host, which is
both faster than a kernel launch and free of compile cost.

Round semantics mirror the reference hot loop (`prover.rs:110-132`): with the
bit-reversed device layout, `start = first_half`, `step = second_half -
first_half`; the round polynomial evaluation at t is
`sum_lanes( sum_products( coeff * prod_j (start_j + t*step_j) ) )`.
"""

from __future__ import annotations

from ..fields import limbs_jnp, limbs_np


class _HostBackend:
    add = staticmethod(limbs_np.add)
    sub = staticmethod(limbs_np.sub)
    mont_mul = staticmethod(limbs_np.mont_mul)
    sum_lanes_wide = staticmethod(limbs_np.sum_lanes_wide)

    @staticmethod
    def stack(rows, axis):
        import numpy as np

        return np.stack(rows, axis=axis)

    @staticmethod
    def take(arr, idx, axis):
        import numpy as np

        return np.take(arr, idx, axis=axis)


class _DeviceBackend:
    add = staticmethod(limbs_jnp.add)
    sub = staticmethod(limbs_jnp.sub)
    mont_mul = staticmethod(limbs_jnp.mont_mul)
    sum_lanes_wide = staticmethod(limbs_jnp.sum_lanes_wide)

    @staticmethod
    def stack(rows, axis):
        import jax.numpy as jnp

        return jnp.stack(rows, axis=axis)

    @staticmethod
    def take(arr, idx, axis):
        import jax.numpy as jnp

        return jnp.take(arr, idx, axis=axis)


HOST = _HostBackend
DEVICE = _DeviceBackend


def fold_tables(ops, stacked, r_col):
    """One variable fold in bit-reversed layout (all tables at once):
    new = first_half + r * (second_half - first_half).

    stacked: (16, [B,] U+1, n); r_col broadcastable (16, [B,] 1, 1).
    Returns (16, [B,] U+1, n//2). The optional B axis batches independent
    instances (throughput mode), each with its own challenge.
    """
    m = stacked.shape[-1] // 2
    even = stacked[..., :m]
    odd = stacked[..., m:]
    return ops.add(even, ops.mont_mul(ops.sub(odd, even), r_col))


def round_sums(ops, stacked, coeffs, idx_mat, degree: int):
    """Evaluate the round polynomial at t = 0..degree and lane-reduce.

    stacked: (16, [B,] U+1, m) bitrev tables (slot U = constant ones).
    coeffs:  (16, [B,] P, 1, 1) Montgomery digit columns, or None when the
    coefficients are already folded into the tables (`device_prover.init_pair`).
    idx_mat: (P, L) integer table indices (ragged products padded with U).
    Returns (WIDE_DIGITS, [B,] degree+1) uint32 — exact integer sums of
    Montgomery residues (host reduces mod p).
    """
    m2 = stacked.shape[-1] // 2
    even = stacked[..., :m2]
    step = ops.sub(stacked[..., m2:], even)
    ladder = [even]
    for _ in range(degree):
        ladder.append(ops.add(ladder[-1], step))
    evals = ops.stack(ladder, axis=-2)  # (16, [B,] U+1, d+1, m2)
    gathered = ops.take(evals, idx_mat, axis=-3)  # (16, [B,] P, L, d+1, m2)
    acc = gathered[..., 0, :, :]
    for l in range(1, gathered.shape[-3]):
        acc = ops.mont_mul(acc, gathered[..., l, :, :])
    if coeffs is not None:
        acc = ops.mont_mul(coeffs, acc)  # (16, [B,] P, d+1, m2)
    total = acc[..., 0, :, :]
    for pi in range(1, acc.shape[-3]):
        total = ops.add(total, acc[..., pi, :, :])
    return ops.sum_lanes_wide(total, axis=-1)  # (WIDE, [B,] d+1)
