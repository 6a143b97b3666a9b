"""Dynamic micro-batching of concurrent retrievals.

The reference throttles concurrency with semaphores (asyncio fan-out to
external services); the TPU-native equivalent is the opposite shape: *collect*
concurrent queries for a few milliseconds and run them as ONE embed forward +
ONE corpus scan (engine.retrieve_batch) — the scan reads the corpus once per
batch, so per-query device cost shrinks linearly with the batch.

Engine calls run in worker threads (the engine's per-tenant locks make that
safe) so the event loop keeps accepting requests while a batch executes.
"""

from __future__ import annotations

import asyncio
import logging

from rassengine_tpu.core.tracing import METRICS

log = logging.getLogger("rassengine.batching")


class MicroBatcher:
    def __init__(self, engine, window_ms: float = 8.0, max_batch: int = 32):
        self.engine = engine
        self.window = window_ms / 1e3
        self.max_batch = max_batch
        self._queue: list[tuple[str, str, int | None, asyncio.Future]] = []
        self._wakeup: asyncio.Event | None = None
        self._runner: asyncio.Task | None = None
        self._loop: asyncio.AbstractEventLoop | None = None

    async def retrieve(self, user_id: str, query: str, top_k: int | None = None):
        loop = asyncio.get_running_loop()
        if self._loop is not loop:
            # wakeup events and runner tasks are loop-bound; after an event
            # loop restart (tests/benches run one asyncio.run per scenario)
            # the old ones would raise "bound to a different event loop",
            # killing the runner and stranding queued futures forever —
            # rebind, failing over any old-loop futures (their awaiters died
            # with their loop)
            for *_rest, stale in self._queue:
                if not stale.done():
                    stale.cancel()
            self._queue = []
            self._loop = loop
            self._wakeup = asyncio.Event()
            self._runner = None
        if self._wakeup is None:
            self._wakeup = asyncio.Event()
        fut: asyncio.Future = loop.create_future()
        self._queue.append((user_id, query, top_k, fut))
        self._wakeup.set()
        if self._runner is None or self._runner.done():
            self._runner = loop.create_task(self._run())
        return await fut

    async def _run(self) -> None:
        while self._queue:
            self._wakeup.clear()
            # collect for one window (or until the batch is full)
            deadline = asyncio.get_running_loop().time() + self.window
            while (len(self._queue) < self.max_batch
                   and asyncio.get_running_loop().time() < deadline):
                try:
                    await asyncio.wait_for(self._wakeup.wait(),
                                           deadline - asyncio.get_running_loop().time())
                    self._wakeup.clear()
                except asyncio.TimeoutError:
                    break
            batch, self._queue = self._queue[: self.max_batch], self._queue[self.max_batch:]
            if not batch:
                continue
            METRICS.incr("microbatches")
            METRICS.observe("microbatch_size", len(batch))
            # group by (user, top_k) → retrieve_batch per group
            groups: dict[tuple, list[int]] = {}
            for i, (user_id, _q, top_k, _f) in enumerate(batch):
                groups.setdefault((user_id, top_k), []).append(i)
            for (user_id, top_k), idxs in groups.items():
                queries = [batch[i][1] for i in idxs]
                try:
                    if len(idxs) == 1:
                        results = [await asyncio.to_thread(
                            self.engine.retrieve, user_id, queries[0], top_k)]
                    else:
                        results = await asyncio.to_thread(
                            self.engine.retrieve_batch, user_id, queries, top_k)
                    for i, res in zip(idxs, results):
                        if not batch[i][3].done():
                            batch[i][3].set_result(res)
                except Exception as e:
                    for i in idxs:
                        if not batch[i][3].done():
                            batch[i][3].set_exception(e)
