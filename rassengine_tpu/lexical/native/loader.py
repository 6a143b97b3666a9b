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
        if hasattr(lib, "bm25_batch_analyze"):
            P = ctypes.POINTER
            lib.bm25_batch_analyze.argtypes = [
                ctypes.c_char_p,                  # texts
                P(ctypes.c_int64),                # offsets [n_texts+1]
                ctypes.c_int64,                   # n_texts
                P(P(ctypes.c_int32)),             # occ_tid out
                P(P(ctypes.c_int32)),             # occ_text out
                P(ctypes.c_int64),                # n_occ out
                P(P(ctypes.c_int32)),             # n_uni out
                P(P(ctypes.c_char)),              # term_bytes out
                P(ctypes.c_int64),                # term_bytes_len out
                P(P(ctypes.c_int64)),             # term_offsets out
                P(ctypes.c_int64),                # n_terms out
            ]
            lib.bm25_batch_analyze.restype = ctypes.c_int32
            lib.bm25_batch_free.argtypes = [ctypes.c_void_p]
            lib.bm25_batch_free.restype = None
        log.info("native bm25 scorer loaded: %s", so)
        _lib = lib
        return _lib


def batch_analyze(texts: list[str]):
    """Tokenize+intern a batch of field texts natively.

    → (occ_tid int32[n_occ], occ_text int32[n_occ], n_uni int32[n_texts],
       terms list[str]) matching python ``analyze(t, bigrams=True)`` per text
    (occurrence order within a text is unigrams then bigrams, same as the
    python path; downstream accumulation is order-insensitive). Returns None
    when the native library is unavailable or lacks the symbol (old cached
    .so) — callers keep the python loop.
    """
    import numpy as np

    lib = get_native_bm25()
    if lib is None or not hasattr(lib, "bm25_batch_analyze"):
        return None
    blobs = [t.lower().encode("utf-8") for t in texts]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    buf = b"".join(blobs)
    P = ctypes.POINTER
    occ_tid = P(ctypes.c_int32)()
    occ_text = P(ctypes.c_int32)()
    n_uni = P(ctypes.c_int32)()
    term_bytes = P(ctypes.c_char)()
    term_offsets = P(ctypes.c_int64)()
    n_occ = ctypes.c_int64()
    tb_len = ctypes.c_int64()
    n_terms = ctypes.c_int64()
    rc = lib.bm25_batch_analyze(
        buf, offsets.ctypes.data_as(P(ctypes.c_int64)),
        ctypes.c_int64(len(blobs)),
        ctypes.byref(occ_tid), ctypes.byref(occ_text), ctypes.byref(n_occ),
        ctypes.byref(n_uni), ctypes.byref(term_bytes), ctypes.byref(tb_len),
        ctypes.byref(term_offsets), ctypes.byref(n_terms))
    try:
        if rc != 0:
            return None
        no, nt = n_occ.value, n_terms.value
        tid = np.ctypeslib.as_array(occ_tid, shape=(no,)).copy() if no else \
            np.empty(0, np.int32)
        tix = np.ctypeslib.as_array(occ_text, shape=(no,)).copy() if no else \
            np.empty(0, np.int32)
        nu = np.ctypeslib.as_array(n_uni, shape=(len(blobs),)).copy() \
            if blobs else np.empty(0, np.int32)
        raw = ctypes.string_at(term_bytes, tb_len.value) if tb_len.value else b""
        toff = np.ctypeslib.as_array(term_offsets, shape=(nt + 1,)) if nt \
            else np.zeros(1, np.int64)
        terms = [raw[toff[i]:toff[i + 1]].decode("utf-8")
                 for i in range(nt)]
        return tid, tix, nu, terms
    finally:
        for p in (occ_tid, occ_text, n_uni, term_bytes, term_offsets):
            if p:
                lib.bm25_batch_free(ctypes.cast(p, ctypes.c_void_p))
