"""Structured Streaming surface (SURVEY.md §2.9 / build-plan Phase 5).

The reference has NO streaming code (its `gtfs-realtime-bindings` dep is
dead — zero imports anywhere); this package supplies the streaming
analogs the survey identifies: incremental ingest (S1 →
``foreachBatch``), event-time windowed aggregation (G1/G2 → tumbling /
sliding windows), gap sessionization (→ ``session_window``), and
watermark-bounded dedup.

Test/driver strategy: each query replays the ``events`` parquet as a
file stream with ``Trigger.AvailableNow`` into a memory sink and
returns the sink as a batch DataFrame, so the DuckDB oracle checks the
*streaming* result exactly. In production the same unbounded plan
writes to kafka/parquet with a real checkpoint — only the sink differs.
"""

from .source import events_stream  # noqa: F401
from . import windows  # noqa: F401  registers stream_* queries
