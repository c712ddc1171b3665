"""Profiler — counters, per-stage transaction timings, expected budgets.

Mirrors `webrender/src/profiler.rs`: named counters with *expected ranges*
(the implicit 60 Hz SLOs, profiler.rs:346-366), a TransactionProfile carried
through the pipeline (render_backend.rs:558), and text report output in
place of the on-screen overlay. `ProfilerHooks`-style callbacks let an
embedder attach markers.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple


@dataclass
class CounterDef:
    name: str
    unit: str = "ms"
    # expected (max, avg) budgets — highlight when exceeded
    expected_max: Optional[float] = None
    expected_avg: Optional[float] = None


# profiler.rs:346-366 expected ranges (60 Hz desktop browsing SLOs)
COUNTERS: Dict[str, CounterDef] = {c.name: c for c in [
    CounterDef("frame_build_time", "ms", 6.0, 3.0),
    CounterDef("visibility_time", "ms", 3.0, 2.0),
    CounterDef("prepare_time", "ms", 3.0, 2.0),
    CounterDef("batching_time", "ms", 3.0, 2.0),
    CounterDef("renderer_time", "ms", 8.0, 5.0),
    CounterDef("frame_cpu_total", "ms", 15.0, 6.0),
    CounterDef("gpu_time", "ms", 15.0, 8.0),
    CounterDef("dl_build_time", "ms", 5.0, 3.0),
    CounterDef("scene_build_time", "ms", 4.0, 3.0),
    CounterDef("content_send_time", "ms", 1.0, None),
    CounterDef("texture_uploads", "count", 10.0, None),
    CounterDef("draw_calls", "count", None, None),
    CounterDef("raster_passes", "count", None, None),
    CounterDef("rendered_tiles", "count", None, None),
    CounterDef("instances", "count", None, None),
    CounterDef("gpu_buffer_floats", "count", None, None),
    CounterDef("slow_frames", "count", 0.0, None),
    CounterDef("slow_transactions", "count", 0.0, None),
]}


@dataclass
class TransactionProfile:
    """Per-published-frame stage timings (render_backend.rs:558-570)."""
    dl_build_ms: float = 0.0
    scene_build_ms: float = 0.0
    frame_build_ms: float = 0.0
    render_ms: float = 0.0


class Profiler:
    """Rolling counters + report text (the overlay renderer's data model)."""

    def __init__(self, window: int = 120):
        self.window = window
        self.samples: Dict[str, List[float]] = {}
        self.hooks: List[Callable[[str, float], None]] = []

    def set(self, name: str, value: float) -> None:
        buf = self.samples.setdefault(name, [])
        buf.append(value)
        if len(buf) > self.window:
            del buf[: len(buf) - self.window]
        for hook in self.hooks:
            hook(name, value)

    def get(self, name: str):
        buf = self.samples.get(name)
        return buf[-1] if buf else None

    def bump(self, name: str, by: float = 1.0) -> None:
        """Monotonic event counter (profiler.rs event counters)."""
        self.set(name, (self.get(name) or 0.0) + by)

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        yield
        self.set(name, (time.perf_counter() - t0) * 1000.0)

    def add_hook(self, fn: Callable[[str, float], None]) -> None:
        """ProfilerHooks (profiler.rs:1440) analog."""
        self.hooks.append(fn)

    def stats(self, name: str) -> Optional[Tuple[float, float, float]]:
        buf = self.samples.get(name)
        if not buf:
            return None
        return min(buf), sum(buf) / len(buf), max(buf)

    def exceeded_budgets(self) -> List[str]:
        out = []
        for name, c in COUNTERS.items():
            st = self.stats(name)
            if st is None:
                continue
            _, avg, mx = st
            if c.expected_max is not None and mx > c.expected_max:
                out.append(f"{name}: max {mx:.2f} > {c.expected_max}")
            elif c.expected_avg is not None and avg > c.expected_avg:
                out.append(f"{name}: avg {avg:.2f} > {c.expected_avg}")
        return out

    def report(self) -> str:
        lines = ["counter                     min      avg      max  unit"]
        for name in sorted(self.samples):
            mn, avg, mx = self.stats(name)
            unit = COUNTERS[name].unit if name in COUNTERS else ""
            lines.append(f"{name:24s} {mn:8.2f} {avg:8.2f} {mx:8.2f}  {unit}")
        over = self.exceeded_budgets()
        if over:
            lines.append("over budget: " + "; ".join(over))
        return "\n".join(lines)
