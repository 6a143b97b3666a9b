"""File path validation + raw EHR document retrieval.

Reference C12: ``validate_file_path`` (app/main.py:1324-1368 — exists/is_file/
extension/readability checks) and ``retrieve_ehr_document`` (main.py:1371-1392
— reads the raw uploaded doc for DOCUMENT_FETCH answers). Hardened here with a
path-traversal guard: a retrieved path must resolve inside the upload root.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("rassengine.files")

SUPPORTED_FILE_EXTENSIONS = (".json", ".md", ".txt")


def validate_file_path(path: str, allowed_extensions=SUPPORTED_FILE_EXTENSIONS) -> bool:
    """True iff path exists, is a regular readable file with a supported extension."""
    try:
        if not path or not os.path.exists(path) or not os.path.isfile(path):
            return False
        if os.path.splitext(path)[1].lower() not in allowed_extensions:
            return False
        return os.access(path, os.R_OK)
    except OSError:
        return False


def retrieve_ehr_document(file_path: str, upload_root: str | None = None,
                          max_bytes: int = 100_000) -> str | None:
    """Read a raw uploaded document (DOCUMENT_FETCH), or None.

    When ``upload_root`` is given, the resolved path must stay inside it —
    indexed file_path metadata is data, not a trusted filesystem reference.
    """
    if not validate_file_path(file_path):
        return None
    real = os.path.realpath(file_path)
    if upload_root:
        root = os.path.realpath(upload_root)
        if not (real == root or real.startswith(root + os.sep)):
            log.warning("refusing document outside upload root: %s", file_path)
            return None
    try:
        with open(real, encoding="utf-8", errors="replace") as f:
            return f.read(max_bytes)
    except OSError as e:
        log.error("failed reading %s: %s", file_path, e)
        return None
