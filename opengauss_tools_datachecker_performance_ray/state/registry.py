"""Run-state registry: per-table status bitmask + throughput window.

Mirrors ``check/cache/TableStatusRegister.java`` /
``check/service/TaskRegisterCenter.java`` (bitmask per table:
source-extracted(1) | sink-extracted(2) | checked(4)) and
``check/cache/CheckRateCache.java`` (rolling rows/s). Driver-side by
default; wrap in a named Ray actor (``RegistryActor``) when several
driver processes need shared progress (the cross-job case).
"""

from __future__ import annotations

import time
from collections import deque


SOURCE_EXTRACTED = 1
SINK_EXTRACTED = 2
CHECKED = 4
COMPLETE = SOURCE_EXTRACTED | SINK_EXTRACTED | CHECKED


class TableStatusRegister:
    def __init__(self, tables: list[str] | None = None):
        self._status: dict[str, int] = {t: 0 for t in (tables or [])}

    def init_table(self, table: str) -> None:
        self._status.setdefault(table, 0)

    def update(self, table: str, flag: int) -> int:
        self.init_table(table)
        self._status[table] |= flag
        return self._status[table]

    def status(self, table: str) -> int:
        return self._status.get(table, 0)

    def is_complete(self, table: str) -> bool:
        return self.status(table) == COMPLETE

    def complete_count(self) -> int:
        return sum(1 for v in self._status.values() if v == COMPLETE)

    def all_complete(self) -> bool:
        return bool(self._status) and all(
            v == COMPLETE for v in self._status.values())


class CheckRateWindow:
    """Rolling rows/s over the last ``window_s`` seconds
    (CheckRateCache analog)."""

    def __init__(self, window_s: float = 60.0,
                 clock=time.time):
        self.window_s = window_s
        self._clock = clock
        self._events: deque[tuple[float, int]] = deque()
        self._total = 0

    def record(self, rows: int) -> None:
        now = self._clock()
        self._events.append((now, rows))
        self._total += rows
        cutoff = now - self.window_s
        while self._events and self._events[0][0] < cutoff:
            self._events.popleft()

    def rate(self) -> float:
        if not self._events:
            return 0.0
        span = max(self._clock() - self._events[0][0], 1e-9)
        return sum(r for _, r in self._events) / span

    @property
    def total_rows(self) -> int:
        return self._total


def make_registry_actor():
    """Named Ray actor wrapping TableStatusRegister for cross-process
    progress (only needed when several drivers share one run)."""
    import ray

    @ray.remote
    class RegistryActor:
        def __init__(self):
            self.reg = TableStatusRegister()

        def update(self, table: str, flag: int) -> int:
            return self.reg.update(table, flag)

        def is_complete(self, table: str) -> bool:
            return self.reg.is_complete(table)

        def complete_count(self) -> int:
            return self.reg.complete_count()

    return RegistryActor
