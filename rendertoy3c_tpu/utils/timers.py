"""Host-side per-phase wall-clock timers.

The TPU equivalent of the reference's state/render/display timing fed into
the ImGui stats overlay (src/wavefront.cpp:334-357, sutil/sutil.cpp:735-773):
accumulated per-phase seconds with periodic formatted reporting.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class PhaseTimers:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._last_report = time.perf_counter()

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        parts = []
        for name in self.totals:
            avg_ms = 1e3 * self.totals[name] / max(self.counts[name], 1)
            parts.append(f"{name}: {avg_ms:8.2f} ms/iter ({self.counts[name]}x)")
        return " | ".join(parts)

    def maybe_report(self, interval_s: float = 0.5):
        """Rate-limited reporting (the overlay refreshes every 0.5 s)."""
        now = time.perf_counter()
        if now - self._last_report >= interval_s:
            self._last_report = now
            return self.summary()
        return None
