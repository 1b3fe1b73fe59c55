"""Throughput/latency instrumentation — parity with the reference's
`WithStats(period, fn)` hook (/root/reference/gomaxscale.go:120-135,
types.go:200-213): per period, number of events + processing time.

Spark already meters every micro-batch; this listener adapts
`StreamingQueryProgress` into the reference's Stats shape and invokes a
user callback, so a consumer migrating from the reference keeps its
dashboards."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql.streaming import StreamingQueryListener


@dataclass(frozen=True)
class Stats:
    """The reference's Stats struct (types.go:200-213)."""

    number_of_events: int
    processing_time_ms: float

    @property
    def events_per_second(self) -> float:
        if self.processing_time_ms <= 0:
            return 0.0
        return self.number_of_events / (self.processing_time_ms / 1000.0)


class StatsListener(StreamingQueryListener):
    """StreamingQueryListener → WithStats callback adapter."""

    def __init__(self, callback: Callable[[Stats], None]) -> None:
        self._callback = callback
        self.totals = Stats(0, 0.0)

    def onQueryStarted(self, event) -> None:  # noqa: D102
        pass

    def onQueryProgress(self, event) -> None:  # noqa: D102
        p = event.progress
        duration = (p.durationMs or {}).get("triggerExecution", 0)
        stats = Stats(int(p.numInputRows), float(duration))
        self.totals = Stats(
            self.totals.number_of_events + stats.number_of_events,
            self.totals.processing_time_ms + stats.processing_time_ms,
        )
        self._callback(stats)

    def onQueryIdle(self, event) -> None:  # noqa: D102
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: D102
        pass
