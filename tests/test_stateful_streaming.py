"""applyInPandasWithState running counts: stream ≡ batch invariant."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rdf_to_text_spark import fixtures
from rdf_to_text_spark.pipeline import extract_pipeline
from rdf_to_text_spark.streaming.stateful import stream_running_counts


def test_running_counts_accumulate_across_microbatches(spark):
    work = tempfile.mkdtemp(prefix="stateful_test_")
    try:
        for i in range(3):
            fixtures.pages_from_range(spark, 150, partitions=1).filter(
                (F.col("doc_id") % 3) == i
            ).coalesce(1).write.parquet(f"{work}/pages/f{i}", mode="overwrite")
        os.makedirs(f"{work}/flat", exist_ok=True)
        for i, p in enumerate(glob.glob(f"{work}/pages/f*/part-*.parquet")):
            shutil.copy(p, f"{work}/flat/{i:03d}.parquet")

        q = stream_running_counts(
            spark, f"{work}/flat", f"{work}/ckpt", query_name="rc_test"
        )
        q.awaitTermination(180)

        final = spark.sql(
            "SELECT entity, max(total_mentions) AS total, max(batches_seen) AS b "
            "FROM rc_test GROUP BY entity"
        ).collect()
        stream_totals = {r.entity: r.total for r in final}
        # state genuinely accumulated across more than one micro-batch
        assert max(r.b for r in final) >= 2

        batch = extract_pipeline(spark.read.parquet(f"{work}/flat"), use_html=True)
        batch_totals = {
            r.subj: r.cnt
            for r in batch.groupBy("subj").agg(F.count("*").alias("cnt")).collect()
        }
        assert stream_totals == batch_totals
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_session_window_stream_equals_batch(spark):
    """session_window streaming rollup ≡ the batch gap sessionizer on
    the same events (compared on (user, start, end, n_events) — session
    ids are a batch-side artifact)."""
    import duckdb  # noqa: F401  (parity of imports with other tests)

    from rdf_to_text_spark.queries_catalog import events_sessionize
    from rdf_to_text_spark.streaming.sessionize import stream_sessionize

    sf = "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="sess_stream_")
    try:
        ev = spark.read.parquet(f"{sf}/events.parquet")
        # precondition for equivalence: no adjacent pair exactly at the gap
        w = F.unix_timestamp("ts") - F.unix_timestamp(
            F.lag("ts").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy("ts", "event_id")
            )
        )
        assert ev.withColumn("g", w).filter(F.col("g") == 1800).count() == 0

        # split into 3 files so multiple micro-batches actually run
        for i in range(3):
            ev.filter((F.col("event_id") % 3) == i).coalesce(1).write.parquet(
                f"{work}/in/f{i}", mode="overwrite"
            )
        os.makedirs(f"{work}/flat", exist_ok=True)
        for i, p in enumerate(glob.glob(f"{work}/in/f*/part-*.parquet")):
            shutil.copy(p, f"{work}/flat/{i:03d}.parquet")

        # files are split by event_id (NOT time-ordered), so a realistic
        # watermark would legitimately drop late events; widen it past
        # the fixture's disorder to test operator equivalence itself
        q = stream_sessionize(
            spark, f"{work}/flat", f"{work}/ckpt",
            watermark="3650 days", query_name="sess_t",
        )
        q.awaitTermination(180)

        stream_rows = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.sql("SELECT * FROM sess_t").collect()
        }
        batch_rows = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in events_sessionize(spark, sf).collect()
        }
        assert stream_rows == batch_rows
        assert len(stream_rows) > 100
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_catalog_stream_sessionize_equals_batch(spark):
    """The driver-facing streaming entry (events_sessionize_stream)
    reproduces the batch twin EXACTLY, session_id included — the
    row_number-over-session_start relabel is the cumulative counter
    because sessions are time-disjoint per user."""
    from rdf_to_text_spark.queries_catalog import (
        events_sessionize,
        events_sessionize_stream,
    )

    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in events_sessionize_stream(spark, sf).collect()}
    want = {tuple(r) for r in events_sessionize(spark, sf).collect()}
    assert got == want
    assert len(got) > 100


def test_session_window_watermark_drops_late_events(spark):
    """With a realistic watermark, events arriving out of time order
    beyond the bound are dropped — the state-bounding contract."""
    from rdf_to_text_spark.queries_catalog import events_sessionize
    from rdf_to_text_spark.streaming.sessionize import stream_sessionize

    sf = "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="sess_late_")
    try:
        ev = spark.read.parquet(f"{sf}/events.parquet")
        for i in range(3):  # event_id split => heavy time disorder across files
            ev.filter((F.col("event_id") % 3) == i).coalesce(1).write.parquet(
                f"{work}/in/f{i}", mode="overwrite"
            )
        os.makedirs(f"{work}/flat", exist_ok=True)
        for i, p in enumerate(glob.glob(f"{work}/in/f*/part-*.parquet")):
            shutil.copy(p, f"{work}/flat/{i:03d}.parquet")
        q = stream_sessionize(
            spark, f"{work}/flat", f"{work}/ckpt",
            watermark="2 hours", query_name="sess_late",
        )
        q.awaitTermination(180)
        n_stream = spark.sql("SELECT sum(n_events) AS n FROM sess_late").collect()[0].n
        n_batch = sum(r.n_events for r in events_sessionize(spark, sf).collect())
        assert n_stream < n_batch  # late events were dropped, by contract
    finally:
        shutil.rmtree(work, ignore_errors=True)
