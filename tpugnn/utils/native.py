"""ctypes loader for the C++ native library (csrc/), with auto-build.

The native layer accelerates host-side, latency-sensitive work that sits
outside the XLA compute path (SURVEY.md §2.2): packed GF(2) linear algebra
for graph construction and the union-find baseline decoder.  Pure-Python
fallbacks exist for every entry point; ``load()`` returns None when no
compiler is available and callers silently fall back.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "_native", "libtpugnn.so")
_CSRC = os.path.join(os.path.dirname(_ROOT), "csrc")

_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_CSRC, check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.path.isdir(_CSRC):
            stale = not os.path.exists(_SO) or any(
                os.path.getmtime(os.path.join(_CSRC, f)) > os.path.getmtime(_SO)
                for f in os.listdir(_CSRC)
            )
            if stale:
                _build()
        if not os.path.exists(_SO):
            return None
        lib = ctypes.CDLL(_SO)
        lib.f2_row_reduce.restype = ctypes.c_int
        lib.f2_row_reduce.argtypes = [_u8, ctypes.c_int, ctypes.c_int, _i32]
        lib.f2_rank.restype = ctypes.c_int
        lib.f2_rank.argtypes = [_u8, ctypes.c_int, ctypes.c_int]
        lib.f2_nullspace.restype = ctypes.c_int
        lib.f2_nullspace.argtypes = [_u8, ctypes.c_int, ctypes.c_int, _u8]
        lib.f2_solve.restype = ctypes.c_int
        lib.f2_solve.argtypes = [_u8, _u8, ctypes.c_int, ctypes.c_int, _u8]
        lib.uf_decode_batch.restype = ctypes.c_int
        lib.uf_decode_batch.argtypes = [
            _i32, _i32, ctypes.c_int, ctypes.c_int,   # edge endpoints, n_edges, n_verts
            _u8, ctypes.c_int,                         # syndromes [batch, n_verts], batch
            _u8,                                       # corrections out [batch, n_edges]
        ]
        lib.osd0_decode_batch.restype = ctypes.c_int
        lib.osd0_decode_batch.argtypes = [
            _u8, ctypes.c_int, ctypes.c_int,           # h [m, n], m, n
            _u8, _f32, ctypes.c_int,                   # syndromes [batch, m], llrs [batch, n], batch
            _u8,                                       # corrections out [batch, n]
        ]
        lib.mwpm_match.restype = ctypes.c_longlong
        lib.mwpm_match.argtypes = [_i64, ctypes.c_int, _i32]
        lib.mwpm_decode_batch.restype = ctypes.c_int
        lib.mwpm_decode_batch.argtypes = [
            _i64, _i32, _i32,                          # dist, par_v, par_e [(nv+1)^2]
            ctypes.c_int, ctypes.c_int,                # nv, n_edges
            ctypes.c_int, ctypes.c_longlong,           # has_boundary, inf sentinel
            _u8, ctypes.c_int,                         # syndromes [batch, nv], batch
            _u8,                                       # corrections out [batch, n_edges]
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return load() is not None
