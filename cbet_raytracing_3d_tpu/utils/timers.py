"""Phase timing, mirroring the reference's gettimeofday instrumentation
(main.cu:99-100,154,198,219-231): Init / Tracing / Combining / Total,
extended with arbitrary named phases and counters (SURVEY.md §5.1)."""

from __future__ import annotations

import time
from contextlib import contextmanager


class PhaseTimers:
    """Accumulates named wall-clock phases; prints the reference's format."""

    def __init__(self):
        self._elapsed: dict[str, float] = {}
        self._t0 = time.perf_counter()

    @contextmanager
    def phase(self, name: str):
        t = time.perf_counter()
        try:
            yield
        finally:
            self._elapsed[name] = self._elapsed.get(name, 0.0) + (time.perf_counter() - t)

    def elapsed(self, name: str) -> float:
        return self._elapsed.get(name, 0.0)

    @property
    def total(self) -> float:
        return time.perf_counter() - self._t0

    def as_dict(self) -> dict[str, float]:
        d = dict(self._elapsed)
        d["Total"] = self.total
        return d

    def report(self) -> str:
        """Reference-style report (main.cu:225-230): one 'Name seconds' line
        per phase, microsecond resolution."""
        lines = [f"rt: {name} {secs:.6f}" for name, secs in self._elapsed.items()]
        lines.append(f"Total {self.total:.6f}")
        return "\n".join(lines)
