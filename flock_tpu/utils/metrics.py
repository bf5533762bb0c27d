"""Structured metrics — the observability analogue.

Reference: Flock has no tracer; it logs to CloudWatch and parses REPORT lines
offline (scripts/parser/cloudwatch).  Here: an in-process metrics registry
recording per-stage rows/bytes/time, renderable as a table or JSON, plus a
``trace`` context manager for jax.profiler integration on real hardware.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class Metrics:
    counters: dict = field(default_factory=lambda: defaultdict(int))
    timings: dict = field(default_factory=lambda: defaultdict(float))

    def count(self, name: str, n: int = 1) -> None:
        self.counters[name] += n

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] += time.perf_counter() - t0

    def rate(self, rows_key: str, time_key: str) -> float:
        t = self.timings.get(time_key, 0.0)
        return self.counters.get(rows_key, 0) / t if t else 0.0

    def to_json(self) -> str:
        return json.dumps({"counters": dict(self.counters),
                           "timings": {k: round(v, 6) for k, v in
                                       self.timings.items()}})

    def report(self) -> str:
        lines = ["metric               value"]
        for k, v in sorted(self.counters.items()):
            lines.append(f"{k:<20} {v}")
        for k, v in sorted(self.timings.items()):
            lines.append(f"{k:<20} {v:.4f}s")
        return "\n".join(lines)


METRICS = Metrics()


@contextlib.contextmanager
def device_trace(name: str, enabled: bool = False):
    """jax.profiler trace hook (writes a TensorBoard trace when enabled)."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(f"/tmp/flock_tpu_trace/{name}"):
        yield
