"""Build + load the native BM25 scorer (g++ → .so → ctypes).

pybind11 is not in the image, so the extension is a plain C ABI compiled on
first use and cached beside the source (or under /tmp when the package dir is
read-only). Falls back to None when no compiler is available — callers keep
the numpy path.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
import threading

log = logging.getLogger("rassengine.native")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "bm25.cpp")


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    candidates = [
        os.path.join(os.path.dirname(_SRC), f"libbm25-{digest}.so"),
        os.path.join(tempfile.gettempdir(), f"rass-libbm25-{digest}.so"),
    ]
    for so in candidates:
        if os.path.exists(so):
            return so
    for so in candidates:
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, _SRC],
                check=True, capture_output=True, timeout=120,
            )
            return so
        except (OSError, subprocess.SubprocessError) as e:
            log.debug("native bm25 build failed at %s: %s", so, e)
    return None


def get_native_bm25() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            log.info("native bm25 unavailable; using numpy scorer")
            return None
        lib = ctypes.CDLL(so)
        lib.bm25_score_query.argtypes = [
            ctypes.POINTER(ctypes.c_int64),   # term_offsets
            ctypes.POINTER(ctypes.c_int32),   # rows
            ctypes.POINTER(ctypes.c_float),   # wtf
            ctypes.POINTER(ctypes.c_float),   # idfs
            ctypes.POINTER(ctypes.c_uint8),   # is_base
            ctypes.c_int32,                   # n_terms
            ctypes.c_float, ctypes.c_float,   # k1, b
            ctypes.POINTER(ctypes.c_float),   # doc_len
            ctypes.c_int64,                   # stride
            ctypes.c_float,                   # avgdl
            ctypes.POINTER(ctypes.c_float),   # out
            ctypes.POINTER(ctypes.c_int32),   # matched (nullable)
        ]
        lib.bm25_score_query.restype = None
        lib.bm25_apply_matched_gate.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int32,
        ]
        lib.bm25_apply_matched_gate.restype = None
        log.info("native bm25 scorer loaded: %s", so)
        _lib = lib
        return _lib
