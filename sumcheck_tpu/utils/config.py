"""Framework configuration (the reference has only Cargo features,
`Cargo.toml:55-58`; SURVEY.md §5 calls for a small runtime config here).

Environment overrides:
- ``SUMCHECK_TPU_DEVICE_THRESHOLD``: table length (lanes) above which prover
  rounds run on the JAX device engine; at or below, the vectorized NumPy host
  engine is used. Unset/0 = backend default (2^8 on real TPU, where the
  chained one-sync prove beats the host engine even for small tables; 2^12
  elsewhere, where XLA compile time dwarfs tiny proves).
- ``SUMCHECK_TPU_ENGINE``: force ``device`` | ``host`` | ``auto`` (default).
- ``SUMCHECK_TPU_PALLAS``: ``auto`` (default: XLA-fused jnp bodies for the
  chained prover — measured 1.66x faster than the handwritten Pallas body
  on the v5e, `MXU_AB.json`; the per-size engine keeps its kernel on real
  TPU), ``on`` (force kernels, incl. interpret mode off-TPU), ``off``.
- ``SUMCHECK_TPU_FIELD``: the process-wide prime field (import-time — the
  constants bake into every kernel): ``bls12_381_fr`` (default) or
  ``bn254_fr`` (`fields/fr.py:_FIELDS`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class Config:
    device_threshold: int = int(os.environ.get("SUMCHECK_TPU_DEVICE_THRESHOLD", 0))
    engine: str = os.environ.get("SUMCHECK_TPU_ENGINE", "auto")  # auto|device|host
    pallas: str = os.environ.get("SUMCHECK_TPU_PALLAS", "auto")  # auto|on|off
    pallas_block: int = int(os.environ.get("SUMCHECK_TPU_PALLAS_BLOCK", 1 << 8))
    chained: str = os.environ.get("SUMCHECK_TPU_CHAINED", "auto")  # auto|on|off
    # chained implementation: "generic" = one shape-generic program for all
    # rounds (protocol/generic_prover.py — no per-size recompiles, the
    # cold-compile fix); "persize" = one fused program per table size
    # (protocol/device_prover.py).
    chain_impl: str = os.environ.get("SUMCHECK_TPU_CHAIN_IMPL", "generic")
    # 2^15 measured best on the v5e for both driver workloads (round 4:
    # ML nv=20 0.1258 vs 0.1294 s at 2^13; GKR nv=18 0.1007 vs 0.1028):
    # fewer masked-block loop iterations beat smaller working sets.
    generic_block: int = int(os.environ.get("SUMCHECK_TPU_GENERIC_BLOCK", 1 << 15))
    # The BATCHED provers run one chain with no narrow-tail split — every
    # round pays >= 1 masked block per instance, so sub-block waste scales
    # with block size. Round-5 A/B at 8 x nv=16 (best ms/proof): 2^11 15.7 /
    # **2^12 15.4** / 2^13 19.7 / 2^14 38.5 / 2^15 83 — full B x nv grid in
    # BATCH_SWEEP.json.
    batch_block: int = int(os.environ.get("SUMCHECK_TPU_BATCH_BLOCK", 1 << 12))
    # narrow-chain block for rounds whose extent has fallen below
    # generic_block (the Pallas tail chain). 2^9 measured best for the GKR
    # nv=18 driver workload on the v5e (round-5 tail sweep); raise/lower to
    # re-A/B on other hardware.
    tail_block: int = int(os.environ.get("SUMCHECK_TPU_TAIL_BLOCK", 1 << 9))
    # pad generic-chain buffers up to this lane family so every instance size
    # below it reuses ONE set of compiled round programs: "auto" = 2^19 lanes
    # (the nv=20 family) on real TPU, off elsewhere; an integer = that
    # power-of-two lane count; "off" disables.
    generic_pad: str = os.environ.get("SUMCHECK_TPU_GENERIC_PAD", "auto")
    # fold-by-challenge multiplies on the MXU (ops/mxu_mul.py): banded-matmul
    # Montgomery multiply by the shared round challenge, bit-identical to the
    # VPU CIOS path. "off" | "on"/"xla" (jnp chain body, XLA-scheduled dots)
    # | "kernel" (in-Pallas dots, single HBM pass) | "auto" (backend default).
    # A/B RESEARCH BODIES: both non-off modes measured SLOWER than the
    # default hybrid on the v5e (MXU_AB.json, round 4) and are quarantined
    # behind SUMCHECK_TPU_AB=1 (VERDICT round-4 ask #8). They stay in-tree
    # as measured A/B fixtures, not product paths.
    mxu_fold: str = os.environ.get("SUMCHECK_TPU_MXU_FOLD", "auto")
    # dev flag unlocking the quarantined A/B bodies (losing measured
    # alternatives kept for future re-measurement on new hardware).
    ab: bool = os.environ.get("SUMCHECK_TPU_AB", "0") not in ("", "0", "off")

    def mxu_mode(self) -> str:
        if self.mxu_fold in ("on", "xla", "kernel") and not self.ab:
            raise ValueError(
                f"SUMCHECK_TPU_MXU_FOLD={self.mxu_fold!r} is a quarantined "
                "A/B body (measured slower than the default on the v5e, "
                "MXU_AB.json); set SUMCHECK_TPU_AB=1 to enable it anyway"
            )
        if self.mxu_fold in ("on", "xla"):
            return "xla"
        if self.mxu_fold == "kernel":
            return "kernel"
        if self.mxu_fold not in ("off", "auto"):
            raise ValueError(
                f"SUMCHECK_TPU_MXU_FOLD={self.mxu_fold!r}: "
                "expected off|on|xla|kernel|auto"
            )
        return "off"

    def use_mxu_fold(self) -> bool:
        """XLA-level shared-scalar MXU multiplies (eq tables, prep scaling)."""
        return self.mxu_mode() != "off"

    def generic_pad_lanes(self) -> int:
        if self.generic_pad == "off":
            return 0
        if self.generic_pad == "auto":
            import jax

            return (1 << 19) if jax.default_backend() == "tpu" else 0
        return 1 << int(self.generic_pad)

    def _threshold(self) -> int:
        """Resolved host/device crossover (lanes). 0 = backend default:
        on real TPU the chained prove is one async dispatch chain + one
        sync, so even small tables win over the (1-core) host engine —
        crossover 2^8; elsewhere XLA compile time dwarfs tiny proves —
        crossover 2^12."""
        if self.device_threshold:
            return self.device_threshold
        import jax

        return (1 << 8) if jax.default_backend() == "tpu" else (1 << 12)

    def use_device(self, table_len: int) -> bool:
        if self.engine == "device":
            return True
        if self.engine == "host":
            return False
        return table_len > self._threshold()

    def use_chained(self, table_len: int) -> bool:
        """Whole-prove-on-device path (transcript included, one final sync)."""
        if self.chained == "off":
            return False
        if self.chained == "on":
            return True
        return self.use_device(table_len)

    def use_pallas(self, table_len: int) -> bool:
        """Fused kernel needs >= 2 lane blocks after folding."""
        if self.pallas == "off" or table_len < 4 * 128:
            return False
        if self.pallas == "on":
            return True
        import jax

        return jax.default_backend() == "tpu"

    @property
    def pallas_interpret(self) -> bool:
        import jax

        return jax.default_backend() != "tpu"


_config = Config()


def get_config() -> Config:
    return _config
