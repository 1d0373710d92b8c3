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


def stream_quality_gate(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """Continuous corpus-curation GATING: the batch quality/lang/token
    expressions (operators/text_analysis.py — pure engine columns, so
    they lift to streaming unchanged) over a documents file stream,
    committed through a checkpointed exactly-once parquet sink. The
    stateless half of the curation chain (the clustering/packing tail
    needs corpus-global state and stays batch); a crawl tail runs this
    continuously and compacts gated micro-batches into curation runs.
    """
    from pyspark.sql import functions as F

    from ..operators.text_analysis import BPE_ISH_PATTERN, EN_STOPWORDS

    docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    lower = F.lower(F.col("text"))
    toks = F.split(F.trim(F.col("text")), r"\s+")
    sw = F.array([F.lit(w) for w in EN_STOPWORDS])
    n_ws = F.size(toks)
    n_sw = F.size(
        F.filter(F.split(F.trim(lower), r"\s+"), lambda t: F.array_contains(sw, t))
    )
    n_alpha = F.length(F.regexp_replace(lower, r"[^a-z]", ""))
    n_nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    matches = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0))
    n_bpe = F.size(F.filter(matches, lambda m: F.trim(m) != F.lit("")))
    gated = (
        docs.filter(F.trim("text") != "")
        .filter(
            n_ws.between(10, 10000) & (100 * n_sw >= n_ws) & (2 * n_alpha >= n_nonspace)
        )
        # lang gate in the INTEGER idiom (20·sw ≥ tok ⇔ ratio ≥ 5%) so
        # the oracle replays it exactly — no float rounding under the hash
        .filter(20 * n_sw >= n_ws)
        .select(
            F.col("doc_id").cast("long"),
            n_ws.cast("int").alias("n_ws_tokens"),
            n_bpe.cast("int").alias("n_bpe_tokens"),
        )
    )
    writer = (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
