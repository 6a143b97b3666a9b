"""Chat persistence: users / chats / messages.

Reference: Prisma + Postgres (prisma/schema.prisma — User{id,email,name},
Chat{id,userId,title}, Message{id,chatId,role,content,createdAt}) with
ownership checks (main.py:2764-2767), last-N history (main.py:2786-2798), and
Q&A create_many (main.py:2948-2963). Implemented on stdlib sqlite3 with the
same model shape; calls are wrapped for asyncio via a thread executor so the
event loop never blocks on disk.
"""

from __future__ import annotations

import asyncio
import sqlite3
import threading
import time
import uuid

_SCHEMA = """
CREATE TABLE IF NOT EXISTS users (
    id TEXT PRIMARY KEY,
    email TEXT UNIQUE,
    name TEXT,
    created_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS chats (
    id TEXT PRIMARY KEY,
    user_id TEXT NOT NULL REFERENCES users(id),
    title TEXT,
    created_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS messages (
    id TEXT PRIMARY KEY,
    chat_id TEXT NOT NULL REFERENCES chats(id),
    role TEXT NOT NULL,
    content TEXT NOT NULL,
    created_at REAL NOT NULL
);
CREATE INDEX IF NOT EXISTS idx_messages_chat ON messages(chat_id, created_at);
"""


class ChatStore:
    def __init__(self, path: str = ":memory:"):
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.row_factory = sqlite3.Row
        self._lock = threading.Lock()
        with self._lock:
            self._conn.executescript(_SCHEMA)
            self._conn.commit()

    # --- sync core (thread-safe) ---------------------------------------------

    def create_user(self, user_id: str | None = None, email: str | None = None,
                    name: str | None = None) -> str:
        uid = user_id or uuid.uuid4().hex
        with self._lock:
            self._conn.execute(
                "INSERT OR IGNORE INTO users (id, email, name, created_at) VALUES (?,?,?,?)",
                (uid, email, name, time.time()),
            )
            self._conn.commit()
        return uid

    def user_exists(self, user_id: str) -> bool:
        with self._lock:
            row = self._conn.execute("SELECT 1 FROM users WHERE id=?", (user_id,)).fetchone()
        return row is not None

    def create_chat(self, user_id: str, chat_id: str | None = None,
                    title: str | None = None) -> str:
        cid = chat_id or uuid.uuid4().hex
        with self._lock:
            self._conn.execute(
                "INSERT OR IGNORE INTO chats (id, user_id, title, created_at) VALUES (?,?,?,?)",
                (cid, user_id, title, time.time()),
            )
            self._conn.commit()
        return cid

    def chat_owner(self, chat_id: str) -> str | None:
        with self._lock:
            row = self._conn.execute("SELECT user_id FROM chats WHERE id=?", (chat_id,)).fetchone()
        return row["user_id"] if row else None

    def history(self, chat_id: str, limit: int = 10) -> list[dict]:
        """Last ``limit`` messages, oldest→newest (reference main.py:2786-2798)."""
        with self._lock:
            rows = self._conn.execute(
                "SELECT role, content, created_at FROM messages WHERE chat_id=? "
                "ORDER BY created_at DESC, rowid DESC LIMIT ?",
                (chat_id, limit),
            ).fetchall()
        return [dict(r) for r in reversed(rows)]

    def add_messages(self, chat_id: str, messages: list[tuple[str, str]]) -> None:
        """create_many of (role, content) pairs (reference main.py:2948-2963)."""
        now = time.time()
        with self._lock:
            self._conn.executemany(
                "INSERT INTO messages (id, chat_id, role, content, created_at) VALUES (?,?,?,?,?)",
                [(uuid.uuid4().hex, chat_id, role, content, now + i * 1e-4)
                 for i, (role, content) in enumerate(messages)],
            )
            self._conn.commit()

    def close(self) -> None:
        with self._lock:
            self._conn.close()

    # --- async wrappers -------------------------------------------------------

    async def a_chat_owner(self, chat_id: str) -> str | None:
        return await asyncio.to_thread(self.chat_owner, chat_id)

    async def a_history(self, chat_id: str, limit: int = 10) -> list[dict]:
        return await asyncio.to_thread(self.history, chat_id, limit)

    async def a_add_messages(self, chat_id: str, messages: list[tuple[str, str]]) -> None:
        await asyncio.to_thread(self.add_messages, chat_id, messages)

    async def a_user_exists(self, user_id: str) -> bool:
        return await asyncio.to_thread(self.user_exists, user_id)
