"""Streaming observability: capture per-batch progress metrics from
Structured Streaming's listener bus.

The reference pipelines ship their run metrics to CloudWatch; the
in-engine equivalent is a StreamingQueryListener that records each
micro-batch's progress (rows read, processing time, per-source
offsets) so tests and operators can assert on throughput and lag
instead of guessing. Listener callbacks run on Spark's listener bus
thread — the capture only appends to a local list (no Spark calls,
no locks beyond list.append's GIL atomicity), which is the documented
safe pattern.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    query_id: str
    batch_id: int
    num_input_rows: int
    duration_ms: dict


@dataclass
class ProgressCapture(StreamingQueryListener):
    """Collects one BatchProgress per completed micro-batch."""

    batches: list[BatchProgress] = field(default_factory=list)
    terminated: list[str] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            BatchProgress(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=dict(p.durationMs or {}),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.append(str(event.id))

    def total_input_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)


@contextlib.contextmanager
def capture_progress(spark: SparkSession):
    """Context manager: attach a ProgressCapture for the duration of a
    streaming run and always detach it (a leaked listener would keep
    recording every later query in the session)."""
    cap = ProgressCapture()
    spark.streams.addListener(cap)
    try:
        yield cap
    finally:
        spark.streams.removeListener(cap)
