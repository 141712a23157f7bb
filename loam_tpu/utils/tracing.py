"""Tracing / profiling / observability.

The reference has no instrumentation at all — stage rates are observable
only through ROS topic rates, and the single printf is the odometry NaN
warning (SURVEY.md §5 "Tracing / profiling" / "Metrics / logging").
Here every stage can be timed host-side, counters accumulate
device-side in the state (nan_skips already does), and the JAX profiler
can capture full XLA traces for xprof.

Usage:
    with tracing.stage("mapping"):
        state, out = mapping_step(...)
    print(tracing.report())

    with tracing.xla_trace("/tmp/loam_trace"):   # view in xprof/tensorboard
        replay(...)
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field

import jax


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


@dataclass
class Tracer:
    """Per-stage wall-clock stats.  `sync=True` blocks on device results
    so timings reflect device work, not dispatch."""

    sync: bool = True
    stats: dict = field(default_factory=lambda: defaultdict(StageStats))

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            out = holder.get("out", result)
            if self.sync and out is not None:
                jax.block_until_ready(out)
            self.stats[name].add(time.perf_counter() - t0)

    def report(self) -> str:
        lines = [f"{'stage':24s} {'n':>6s} {'mean ms':>9s} "
                 f"{'min ms':>9s} {'max ms':>9s} {'total s':>9s}"]
        for name, s in sorted(self.stats.items()):
            lines.append(
                f"{name:24s} {s.count:6d} {s.mean_s*1e3:9.2f} "
                f"{s.min_s*1e3:9.2f} {s.max_s*1e3:9.2f} {s.total_s:9.2f}"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            k: {"count": v.count, "mean_ms": v.mean_s * 1e3,
                "total_s": v.total_s}
            for k, v in self.stats.items()
        }

    def reset(self) -> None:
        self.stats.clear()


_GLOBAL = Tracer()


def stage(name: str, result=None):
    return _GLOBAL.stage(name, result)


def report() -> str:
    return _GLOBAL.report()


def reset() -> None:
    _GLOBAL.reset()


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA device trace viewable in xprof / tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up on the xprof timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield
