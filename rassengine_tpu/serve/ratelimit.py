"""Per-key token-bucket rate limiting for the upload service.

The reference bounds a single request (≤5 files, ≤10 MB each,
embedding_gen.py:1239-1250) but nothing stops one user from looping uploads
and starving the embed queue for every tenant. A token bucket per user gives
burst-friendly sustained-rate control: capacity = one burst, refill =
``rate_per_min``; buckets for idle keys are pruned so the table stays O(active
users).
"""

from __future__ import annotations

import threading
import time


class RateLimiter:
    """Token bucket per key. ``rate_per_min <= 0`` disables (always allow)."""

    def __init__(self, rate_per_min: float, burst: int | None = None,
                 now=time.monotonic):
        self.rate = rate_per_min / 60.0
        self.burst = float(burst if burst is not None
                           else max(1.0, rate_per_min))
        self._now = now
        self._lock = threading.Lock()
        self._buckets: dict[str, tuple[float, float]] = {}  # key → (tokens, t)
        self._prune_at = 4096

    def allow(self, key: str, cost: float = 1.0) -> bool:
        if self.rate <= 0:
            return True
        t = self._now()
        with self._lock:
            tokens, last = self._buckets.get(key, (self.burst, t))
            tokens = min(self.burst, tokens + (t - last) * self.rate)
            ok = tokens >= cost
            if ok:
                tokens -= cost
            self._buckets[key] = (tokens, t)
            if len(self._buckets) > self._prune_at:
                self._prune(t)
                # if nothing was freeable (every key mid-refill), back off
                # the next sweep instead of paying O(n) on EVERY allow()
                self._prune_at = max(4096, 2 * len(self._buckets))
            return ok

    def retry_after(self, key: str, cost: float = 1.0) -> float:
        """Seconds until ``allow(key)`` could succeed (for the 429 header)."""
        if self.rate <= 0:
            return 0.0
        with self._lock:
            tokens, last = self._buckets.get(key, (self.burst, self._now()))
        deficit = cost - (tokens + (self._now() - last) * self.rate)
        return max(0.0, deficit / self.rate)

    def _prune(self, t: float) -> None:
        # full buckets carry no state — refill would restore them anyway
        full = [k for k, (tok, last) in self._buckets.items()
                if tok + (t - last) * self.rate >= self.burst]
        for k in full:
            del self._buckets[k]
