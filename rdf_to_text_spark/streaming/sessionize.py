"""Structured Streaming sessionization: the `session_window` twin of the
batch gap-based sessionizer (queries_catalog.events_sessionize).

Same semantics, two runtimes: the batch formulation (lag + cumulative
session counter) is the oracle-checkable twin; this one runs the native
session-window operator with a watermark bounding state for late
events — the shape a 100-TB event firehose actually uses. A session's
`session_window.end` is last_event + gap, so the batch twin's
session_end (= last event ts) is `window.end - gap`.

Boundary note: the batch twin starts a NEW session when the gap is
STRICTLY greater than the threshold; `session_window` merges only while
the gap is strictly smaller — events exactly `gap` apart diverge. The
stream≡batch test asserts its fixture has no such pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """events stream → per-(user, session) rollup via session_window.

    Output: (user_id, session_start, session_end, n_events) where
    session_end = last event ts (window.end minus the gap), matching
    the batch twin's columns.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    win = F.session_window("ts", gap)
    agg = src.groupBy(win, "user_id").agg(F.count("*").alias("n_events"))
    return agg.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        (F.col("session_window.end") - F.expr(f"INTERVAL {gap}")).alias("session_end"),
        "n_events",
    )


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    checkpoint: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    query_name: str = "sessions",
):
    """File-source micro-batched run → in-memory table `query_name`.

    Complete output mode: the test harness reads the final table once
    the availableNow trigger drains; production sinks would run update/
    append with the watermark finalizing sessions incrementally.
    Events older than the watermark when their micro-batch arrives are
    DROPPED (standard late-data semantics) — an equivalence test must
    either feed files in time order or widen the watermark past the
    fixture's disorder.
    """
    src = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = sessionize_stream(src, gap, watermark)
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
