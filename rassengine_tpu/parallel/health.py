"""Automatic device-failure detection → live reshard onto the survivors.

The reference has NO in-process failure detection (SURVEY §5: its pattern is
swallow-and-degrade per call + Docker ``restart: unless-stopped`` +
OpenSearch replicas, docker-compose.yml:38-51, main.py:89-90). A TPU-native
serving fleet owns its devices directly, so device loss must be handled
in-process: this monitor probes every mesh device with a tiny round-trip op
under a timeout, and when a device stops answering it re-forms the serving
mesh from the survivors via ``engine.reshard(..., devices=healthy)`` — the
same live re-placement path an operator would invoke, now automatic.

Design notes:

- **Probe = put + add + fetch per device**, each in its own worker thread
  with a deadline. A lost/wedged chip manifests as a hang, not an exception,
  so the timeout IS the detector. Threads stuck on a dead device leak until
  the runtime clears; the pool is replaced after any timeout so later probes
  never queue behind a stuck one.
- **Debounce**: a device must fail ``fail_threshold`` consecutive ticks
  before it is declared dead (transient tunnel/queue stalls recover between
  ticks). Recovery of a declared-dead device does NOT auto-grow the mesh —
  shrink is safety, grow is capacity planning; flapping a mesh re-places
  every tenant each swing. The operator reshards back up explicitly.
- **Degrade order: capacity first, redundancy second.** On loss the new
  topology keeps as many shards as survivors allow and drops replicas to 1
  — a smaller fleet serving ALL the data beats a redundant fleet serving
  part of it (mirrors OpenSearch turning primaries-only when replicas can't
  place).
"""

from __future__ import annotations

import asyncio
import logging
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import TimeoutError as FutureTimeout

import numpy as np

log = logging.getLogger("rassengine.health")


def probe_devices(devices=None, timeout_s: float = 20.0, probe_op=None):
    """Round-trip a tiny op on each device → (healthy, failed) lists.

    Each probe is host→device put + add + device→host fetch: the fetch is the
    only sync that reliably blocks on every platform (CLAUDE.md: the axon
    tunnel's block_until_ready is unreliable — a device→host copy is not).
    ``probe_op(device)`` is injectable for tests (e.g. a probe that hangs).
    """
    import jax
    import jax.numpy as jnp

    devs = list(devices) if devices is not None else jax.devices()

    def default_one(dev):
        x = jax.device_put(jnp.ones((8,), jnp.float32), dev)
        return float(np.asarray(x + 1.0)[0])

    one = probe_op or default_one

    healthy, failed = [], []
    # NO context manager: its __exit__ is shutdown(wait=True), which would
    # join a probe thread stuck on the very wedged device this function
    # exists to detect — the per-future timeout would never surface. Stuck
    # threads are abandoned (daemonized pool, doc note above) and the pool
    # is torn down without waiting.
    pool = ThreadPoolExecutor(max_workers=len(devs))
    try:
        futs = [(d, pool.submit(one, d)) for d in devs]
        deadline = time.monotonic() + timeout_s
        for d, fut in futs:
            try:
                fut.result(timeout=max(0.0, deadline - time.monotonic()))
                healthy.append(d)
            except (FutureTimeout, Exception):  # noqa: BLE001 — dead is dead
                failed.append(d)
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
    return healthy, failed


class DeviceHealthMonitor:
    """Periodic device probes; on sustained loss, reshard onto survivors.

    ``probe_fn`` is injectable for tests (return (healthy, failed) device
    lists); ``tick()`` runs one probe+decision cycle synchronously and
    returns True when it triggered a reshard.
    """

    def __init__(self, engine, interval_s: float = 15.0,
                 probe_timeout_s: float = 20.0, fail_threshold: int = 2,
                 probe_fn=None):
        self.engine = engine
        self.interval_s = interval_s
        self.probe_timeout_s = probe_timeout_s
        self.fail_threshold = max(1, fail_threshold)
        self._probe = probe_fn or (
            lambda: probe_devices(timeout_s=self.probe_timeout_s))
        self._fails: dict = {}          # device → consecutive failed ticks
        self._lock = threading.Lock()
        self.resharded = 0              # lifetime auto-reshard count
        self.last_status: dict = {"healthy": None, "failed": 0,
                                  "last_probe_s": None}

    # --- decision cycle -------------------------------------------------------

    def tick(self) -> bool:
        t0 = time.monotonic()
        healthy, failed = self._probe()
        self.last_status = {"healthy": len(healthy), "failed": len(failed),
                            "last_probe_s": round(time.monotonic() - t0, 3)}
        with self._lock:
            for d in healthy:
                self._fails.pop(d, None)
            dead = []
            for d in failed:
                self._fails[d] = self._fails.get(d, 0) + 1
                if self._fails[d] >= self.fail_threshold:
                    dead.append(d)
        if not dead:
            return False
        mesh = getattr(self.engine, "mesh", None)
        in_use = set(mesh.devices.flat) if mesh is not None else set()
        if not in_use & set(dead):
            # losing an idle spare changes nothing; note it and move on
            log.warning("device(s) %s unresponsive but not in the serving "
                        "mesh; no reshard", dead)
            return False
        if not healthy:
            log.error("ALL devices unresponsive — nothing to reshard onto")
            return False
        # capacity first, redundancy second: all survivors become shards
        n_new = len(healthy)
        log.warning("device loss detected (%d dead, %d healthy) — "
                    "resharding onto survivors as %d×1", len(dead),
                    n_new, n_new)
        moved = self.engine.reshard(n_new, 1, devices=healthy)
        self.resharded += 1
        log.warning("auto-reshard complete: %s", moved)
        with self._lock:
            for d in dead:
                self._fails.pop(d, None)  # declared + handled
        return True

    async def run(self) -> None:
        """asyncio loop for serve/app.py — probes run off-thread so a hung
        device never blocks the event loop."""
        while True:
            await asyncio.sleep(self.interval_s)
            try:
                await asyncio.to_thread(self.tick)
            except Exception:
                log.exception("health tick failed")

    def status(self) -> dict:
        return {**self.last_status, "auto_reshards": self.resharded,
                "suspect_devices": len(self._fails)}
