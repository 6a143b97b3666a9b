"""Request tracing and per-stage latency metrics.

The reference has no tracing at all (SURVEY §5: logging.basicConfig only). Here
every query carries a request id, each pipeline stage is timed, and aggregate
histograms back the bench suite's QPS/latency numbers. When
``EngineConfig.profile_dir`` is set, a ``jax.profiler`` trace is captured around
device work.
"""

from __future__ import annotations

import contextlib
import contextvars
import logging
import threading
import time
import uuid
from collections import defaultdict
from dataclasses import dataclass, field

log = logging.getLogger("rassengine")

_current_trace: contextvars.ContextVar["RequestTrace | None"] = contextvars.ContextVar(
    "rass_trace", default=None
)


@dataclass
class RequestTrace:
    request_id: str
    started: float = field(default_factory=time.perf_counter)
    stages: dict[str, float] = field(default_factory=dict)  # stage → seconds

    def record(self, stage: str, seconds: float) -> None:
        self.stages[stage] = self.stages.get(stage, 0.0) + seconds

    def total(self) -> float:
        return time.perf_counter() - self.started

    def summary(self) -> dict:
        out = {"request_id": self.request_id, "total_ms": round(self.total() * 1e3, 3)}
        out.update({f"{k}_ms": round(v * 1e3, 3) for k, v in self.stages.items()})
        return out


class Metrics:
    """Process-wide counters and latency accumulators (thread-safe)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: dict[str, int] = defaultdict(int)
        self.latencies: dict[str, list[float]] = defaultdict(list)

    def incr(self, name: str, by: int = 1) -> None:
        with self._lock:
            self.counters[name] += by

    def observe(self, name: str, seconds: float) -> None:
        with self._lock:
            buf = self.latencies[name]
            buf.append(seconds)
            if len(buf) > 10_000:
                del buf[: len(buf) // 2]

    def snapshot(self) -> dict:
        with self._lock:
            out: dict = {"counters": dict(self.counters)}
            lat = {}
            for name, buf in self.latencies.items():
                if not buf:
                    continue
                s = sorted(buf)
                n = len(s)
                lat[name] = {
                    "count": n,
                    "p50_ms": round(s[n // 2] * 1e3, 3),
                    "p99_ms": round(s[min(n - 1, int(n * 0.99))] * 1e3, 3),
                    "mean_ms": round(sum(s) / n * 1e3, 3),
                }
            out["latency"] = lat
            return out


    def prometheus(self) -> str:
        """Prometheus text exposition of the snapshot (GET /metrics?format=prometheus)."""
        snap = self.snapshot()
        lines = []
        for name, v in sorted(snap["counters"].items()):
            m = f"rass_{name}_total"
            lines += [f"# TYPE {m} counter", f"{m} {v}"]
        for name, st in sorted(snap["latency"].items()):
            m = f"rass_{name}_latency_ms"
            lines += [f"# TYPE {m} summary",
                      f'{m}{{quantile="0.5"}} {st["p50_ms"]}',
                      f'{m}{{quantile="0.99"}} {st["p99_ms"]}',
                      f"{m}_count {st['count']}",
                      # summaries only permit quantile/_sum/_count series —
                      # strict OpenMetrics parsers reject a '_mean' sample
                      f"{m}_sum {round(st['mean_ms'] * st['count'], 3)}"]
        return "\n".join(lines) + "\n"


METRICS = Metrics()


def new_trace(request_id: str | None = None) -> RequestTrace:
    trace = RequestTrace(request_id or uuid.uuid4().hex[:16])
    _current_trace.set(trace)
    return trace


def current_trace() -> RequestTrace | None:
    return _current_trace.get()


@contextlib.contextmanager
def stage(name: str):
    """Time a pipeline stage against the current request trace + global metrics."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        METRICS.observe(name, dt)
        trace = _current_trace.get()
        if trace is not None:
            trace.record(name, dt)


@contextlib.contextmanager
def device_profile(profile_dir: str):
    """Capture a jax.profiler trace if profile_dir is configured."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
