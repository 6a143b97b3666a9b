"""Structured audit log: one JSON line per security-relevant event.

The reference has no audit trail — uploads and asks leave only interleaved
uvicorn stdout (app/embedding_gen.py logs, main.py:2996-3018). A standalone
clinical-data service needs an append-only, machine-parseable record of who
touched which patient data when; this writes JSONL (ts, event, user_id,
status + event detail) with size-based rotation, so the file is greppable and
ingestible by any log pipeline without a parser.

Disabled when ``EngineConfig.audit_log_path`` is empty (the default for
tests/dev). Writes happen on the event loop's thread but are microseconds
(buffered append); an audit failure never fails the request — it logs.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time

log = logging.getLogger("rassengine.audit")


class AuditLog:
    """Append-only JSONL audit writer with size-based rotation."""

    def __init__(self, path: str, max_bytes: int = 64 * 1024 * 1024):
        self.path = path
        self.max_bytes = max_bytes
        self._lock = threading.Lock()
        if path:
            d = os.path.dirname(os.path.abspath(path))
            os.makedirs(d, exist_ok=True)

    @property
    def enabled(self) -> bool:
        return bool(self.path)

    def emit(self, event: str, user_id: str = "", status: str = "ok",
             **detail) -> None:
        """Record one event; never raises into the request path."""
        if not self.path:
            return
        rec = {"ts": round(time.time(), 3), "event": event,
               "user_id": user_id, "status": status}
        rec.update(detail)
        line = json.dumps(rec, default=str) + "\n"
        try:
            with self._lock:
                # rotation accounting must use the UTF-8 byte length that
                # actually lands on disk, not the character count
                self._maybe_rotate(len(line.encode("utf-8")))
                with open(self.path, "a", encoding="utf-8") as f:
                    f.write(line)
        except OSError:
            log.exception("audit write failed (event=%s)", event)

    def _maybe_rotate(self, incoming: int) -> None:
        try:
            size = os.path.getsize(self.path)
        except OSError:
            return
        if size + incoming <= self.max_bytes:
            return
        rotated = self.path + ".1"
        if os.path.exists(rotated):
            os.unlink(rotated)
        os.replace(self.path, rotated)


_NULL = AuditLog("")


def null_audit() -> AuditLog:
    """Shared disabled instance (tests, audit_log_path='')."""
    return _NULL
