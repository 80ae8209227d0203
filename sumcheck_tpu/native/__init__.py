"""Native runtime components, built on demand with the system C compiler.

The compute path is JAX/XLA/Pallas (TPU); these are the *host runtime*
pieces where pure Python costs real protocol latency — currently the
Fiat-Shamir transcript core (`fastrng.c`): the verifier hashes and
rejection-samples once per round, and CPython overhead made that the
dominant verify cost (VERDICT.md round-2 weakness #4).

Build model: `cc -O2 -shared -fPIC` into the package directory, keyed by
source hash, at first import; any failure (no compiler, read-only install,
odd platform) silently falls back to the hashlib/pure-Python paths —
`lib()` returns None and callers must tolerate it. Kill switch:
``SUMCHECK_TPU_NATIVE=off``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastrng.c")

_lib = None
_tried = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so = os.path.join(_DIR, f"_fastrng_{tag}.so")
    if os.path.exists(so):
        return so
    cc = os.environ.get("CC", "cc")
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so)  # atomic: concurrent builders race benignly
        return so
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def lib():
    """The loaded native library, or None (caller falls back to Python)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SUMCHECK_TPU_NATIVE", "auto") == "off":
        return None
    try:
        so = _build()
        if so is None:
            return None
        L = ctypes.CDLL(so)
        u64, cp, vp = ctypes.c_uint64, ctypes.c_char_p, ctypes.c_void_p
        L.b2_ctx_size.restype = u64
        L.b2_init.argtypes = [vp]
        L.b2_update.argtypes = [vp, cp, u64]
        L.b2_digest.argtypes = [vp, vp]
        L.b2_fill.argtypes = [vp, vp, u64]
        L.b2_draw4.argtypes = [vp, vp]
        L.b2_fr_draw.restype = ctypes.c_int
        L.b2_fr_draw.argtypes = [vp, vp, u64, vp]
        L.b2_fr_draw_canonical.restype = ctypes.c_int
        L.b2_fr_draw_canonical.argtypes = [vp, vp, u64, u64, vp]
        L.b2_get_state.argtypes = [vp, vp, vp, vp, vp]
        L.b2_set_state.argtypes = [vp, vp, u64, cp, u64]
        L.fr_interp_eval.restype = ctypes.c_int
        L.fr_interp_eval.argtypes = [vp, u64, vp, vp, vp, u64, vp, vp]
        L.fr_check_rounds.restype = ctypes.c_int
        L.fr_check_rounds.argtypes = [vp, u64, u64, vp, vp, vp, vp, u64, vp, vp]
        L.fr_verify_rounds.restype = ctypes.c_int
        L.fr_verify_rounds.argtypes = [
            vp, cp, u64, u64, vp, vp, vp, u64, u64, vp, vp, vp
        ]
        if int(L.b2_ctx_size()) > 512:
            return None  # struct layout surprise; refuse rather than corrupt
        _lib = L
    except Exception as e:  # noqa: BLE001 — any failure means "no native"
        print(f"# sumcheck_tpu: native transcript unavailable ({e!r})",
              file=sys.stderr)
        _lib = None
    return _lib
