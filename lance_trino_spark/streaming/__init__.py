"""Structured Streaming operators (beyond-reference extension).

The reference connector is batch-only (SURVEY.md §2B "Streaming: Absent");
this package supplies the streaming surface a Spark-native engine gets for
free: file-source streams over the same tables, watermarked windowed
aggregation, built-in session windows, a custom stateful operator via
``applyInPandasWithState``, and streaming deduplication. Batch shapes of the
same analytics live in ``suite/events.py``; the streaming variants here are
registered in ``suite/streaming.py`` with the matching DuckDB oracles.

Scale notes: every operator below is a normal incremental streaming plan —
state is partitioned by the grouping key across executors, aggregation state
lives in the state store (RocksDB on a real cluster), and only the final
small result ever reaches the driver (memory sink used solely as the test
harness's collection point; production would writeStream to a Lance/parquet
sink as in ``sources/lance_datasource.py:ds03``).
"""

from .events import (
    attribution_join_stream,
    dedup_documents_stream,
    hourly_stats_stream,
    run_to_memory,
    session_stats_stream,
    stateful_user_stats_stream,
    stream_table,
)

__all__ = [
    "attribution_join_stream",
    "dedup_documents_stream",
    "hourly_stats_stream",
    "run_to_memory",
    "session_stats_stream",
    "stateful_user_stats_stream",
    "stream_table",
]
