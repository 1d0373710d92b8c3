"""Structured Streaming ingest for the extraction pipeline.

The reference is batch-only (SURVEY.md §2.10), but a web-scale KG
builder ingests crawls continuously; this module runs the *same*
extraction operators over a file stream with exactly-once sinks:

  pages parquet dir (readStream) → extract_pipeline → triples parquet
  (append, checkpointed), plus a watermarked per-hour crawl-rate
  aggregate — the canonical late-data pattern.

The batch and streaming paths share every operator: `extract_pipeline`
is a narrow map, so it lifts to streaming unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..fixtures import PAGES_SCHEMA
from ..pipeline import extract_pipeline


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """File-stream extraction with checkpointed exactly-once output.

    `max_files_per_trigger` caps the files per micro-batch — set it
    BELOW the input file count to genuinely exercise multi-batch
    processing (and the sink's per-batch exactly-once commits); the
    catalog's driver query does, and asserts ≥2 batches ran.
    """
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    triples = extract_pipeline(pages, use_html=True)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def crawl_rate(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window ingest rate (docs/hour by lang).

    Works on both batch and streaming DataFrames; with a stream, the
    watermark bounds state for late pages.
    """
    src = pages
    if pages.isStreaming:
        src = pages.withWatermark("warc_ts", watermark)
    return src.groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang").agg(
        F.count("*").alias("n_pages")
    )


def stream_structdata(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """Continuous structured-data mining: the SAME JSON-LD extraction
    operator (operators/structdata.py:html_jsonld) lifted to a file
    stream with a checkpointed exactly-once sink — narrow maps lift to
    streaming unchanged, so the batch/stream equivalence the flagship
    proves extends to the structured-data family."""
    from ..fixtures_struct import STRUCT_PAGES_SCHEMA
    from ..operators.structdata import html_jsonld

    pages = (
        spark.readStream.schema(STRUCT_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    facts = html_jsonld(pages)
    writer = (
        facts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
