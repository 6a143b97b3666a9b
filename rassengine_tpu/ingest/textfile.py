"""Plain-text and markdown file parsing → unstructured docs.

Reference: parse_text_file (app/main.py:1167-1208) with utf-8 → latin-1
fallback and ``{file_type}-{stem}-{i}`` chunk ids;
infer_patient_id_from_filename (main.py:1158-1164);
parse_markdown_file (embedding_gen.py:98-115) — dead code upstream, implemented
for real here: markdown → HTML → plain text so formatting noise never reaches
the embedder.
"""

from __future__ import annotations

import logging
import os
import re

from rassengine_tpu.ingest.chunker import chunk_text

log = logging.getLogger("rassengine.ingest")

FILE_TYPE_TEXT = "text"
FILE_TYPE_MARKDOWN = "markdown"

_PATIENT_RE = re.compile(r"patient_(\d+)", re.IGNORECASE)


def infer_patient_id_from_filename(filename: str) -> str | None:
    m = _PATIENT_RE.search(os.path.basename(filename or ""))
    return m.group(1) if m else None


def _read_text(path: str) -> str:
    try:
        with open(path, encoding="utf-8") as f:
            return f.read()
    except UnicodeDecodeError:
        with open(path, encoding="latin-1") as f:
            return f.read()


def _docs_from_text(text: str, path: str, file_type: str, chunk_size: int,
                    patient_id: str | None, adaptive: bool = False,
                    overlap: int = 0) -> list[dict]:
    stem = os.path.splitext(os.path.basename(path))[0]
    pid = patient_id or infer_patient_id_from_filename(path)
    docs = []
    for i, chunk in enumerate(chunk_text(text, chunk_size, adaptive=adaptive,
                                         overlap=overlap)):
        docs.append({
            "doc_id": f"{file_type}-{stem}-{i}",
            "doc_type": "unstructured",
            "resourceType": "Generic",
            "patientId": pid,
            "file_path": path,
            "file_type": file_type,
            "unstructuredText": chunk,
        })
    return docs


def parse_text_file(path: str, chunk_size: int = 512,
                    patient_id: str | None = None, *, adaptive: bool = False,
                    overlap: int = 0) -> list[dict]:
    return _docs_from_text(_read_text(path), path, FILE_TYPE_TEXT, chunk_size,
                           patient_id, adaptive, overlap)


def parse_markdown_file(path: str, chunk_size: int = 512,
                        patient_id: str | None = None, *,
                        adaptive: bool = False, overlap: int = 0) -> list[dict]:
    raw = _read_text(path)
    try:
        import markdown as md
        from bs4 import BeautifulSoup

        html = md.markdown(raw)
        text = BeautifulSoup(html, "html.parser").get_text(separator=" ")
    except Exception:  # markdown lib unavailable → index the raw text
        log.warning("markdown render failed for %s; indexing raw", path)
        text = raw
    return _docs_from_text(text, path, FILE_TYPE_MARKDOWN, chunk_size,
                           patient_id, adaptive, overlap)
