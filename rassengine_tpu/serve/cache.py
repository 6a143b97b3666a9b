"""Semantic answer cache keyed by query-embedding similarity.

The reference *defines* a Redis semantic-cache config block
(.env.example:19-24: CACHE_SIM_THRESHOLD=0.88, TTL 480 s, max 1000 items) but
never uses it (SURVEY §5). Implemented for real here: answers are cached per
(user, patient) scope and hit when a new query's embedding cosine-matches a
cached query above the threshold within the TTL. Lookup is one dot product
over the cached embedding matrix — host numpy, O(items × dim).
"""

from __future__ import annotations

import time

import numpy as np


class SemanticCache:
    def __init__(self, max_items: int = 1000, sim_threshold: float = 0.88,
                 ttl_seconds: float = 480.0):
        self.max_items = max_items
        self.sim_threshold = sim_threshold
        self.ttl = ttl_seconds
        self._embs: list[np.ndarray] = []
        self._entries: list[tuple[float, str, str]] = []  # (ts, scope, answer)

    def _evict(self) -> None:
        now = time.time()
        keep = [i for i, (ts, _, _) in enumerate(self._entries) if now - ts < self.ttl]
        if len(keep) != len(self._entries):
            self._entries = [self._entries[i] for i in keep]
            self._embs = [self._embs[i] for i in keep]
        while len(self._entries) > self.max_items:
            self._entries.pop(0)
            self._embs.pop(0)

    def get(self, scope: str, query_emb: np.ndarray) -> str | None:
        self._evict()
        if not self._entries:
            return None
        q = np.asarray(query_emb, np.float32).reshape(-1)
        n = float(np.linalg.norm(q))
        if n == 0:
            return None
        q = q / n  # NOT in-place: jax-derived arrays arrive read-only
        sims = np.stack(self._embs) @ q
        order = np.argsort(-sims)
        for i in order:
            if sims[i] < self.sim_threshold:
                break
            if self._entries[i][1] == scope:
                return self._entries[i][2]
        return None

    def put(self, scope: str, query_emb: np.ndarray, answer: str) -> None:
        q = np.asarray(query_emb, np.float32).reshape(-1)
        n = float(np.linalg.norm(q))
        if n == 0:
            return
        self._embs.append(q / n)
        self._entries.append((time.time(), scope, answer))
        self._evict()
