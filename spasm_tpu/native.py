"""Loader for the framework's native (C) components.

The hot host-side path worth native code is SMS parsing (SURVEY.md
section 7: "C++ only where host-native speed is irreplaceable").  The
shared library is compiled on first use from csrc/ into a per-user cache
keyed by a source hash; everything degrades gracefully to the NumPy
implementations if no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc")
_lib = None
_tried = False


def _build_and_load():
    src = os.path.join(_CSRC, "sms_parser.c")
    with open(src, "rb") as fh:
        tag = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache = os.path.join(os.path.expanduser("~/.cache/spasm_tpu_native"))
    os.makedirs(cache, exist_ok=True)
    sofile = os.path.join(cache, f"sms_parser_{tag}.so")
    if not os.path.exists(sofile):
        cc = os.environ.get("CC", "cc")
        cmd = [cc, "-O3", "-shared", "-fPIC", "-o", sofile + ".tmp", src]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(sofile + ".tmp", sofile)
    lib = ctypes.CDLL(sofile)
    fn = lib.spasm_tpu_parse_sms
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                   ctypes.POINTER(ctypes.c_int64),
                   ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    return lib


def get_lib():
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        if os.environ.get("SPASM_TPU_NO_NATIVE"):
            return None
        try:
            _lib = _build_and_load()
        except Exception as exc:  # pragma: no cover - env without cc
            print(f"spasm_tpu: native parser unavailable ({exc}); "
                  "using NumPy fallback", file=sys.stderr)
    return _lib


def parse_sms_native(raw: bytes):
    """Parse SMS bytes -> (n, m, i, j, v) or None if unavailable/invalid."""
    lib = get_lib()
    if lib is None:
        return None
    # upper bound on triples: one per newline
    cap = max(16, raw.count(b"\n") + 2)
    header = (ctypes.c_int64 * 2)()
    out = np.empty(3 * cap, dtype=np.int64)
    count = lib.spasm_tpu_parse_sms(
        raw, len(raw), header,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap)
    if count < 0:
        return None
    tri = out[:3 * count].reshape(-1, 3)
    return (int(header[0]), int(header[1]),
            tri[:, 0].copy(), tri[:, 1].copy(), tri[:, 2].copy())
