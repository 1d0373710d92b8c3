"""Idempotent graph materialization + per-partition lineage (resumability).

north_rule: canonical (subj, pred, obj) triples are MERGEd into entity
and edge tables partitioned by subject hash bucket; per-partition
lineage + metrics rows make the job exactly resumable.

The Iceberg runtime jar is not available in this sandbox, so the sink
is abstracted behind one module with two equivalent implementations:

  * :class:`IcebergMerge` — emits the real ``MERGE INTO`` statement
    (used verbatim when a catalog is configured);
  * :class:`BucketedParquetMerge` — the documented fallback: Hive-style
    ``bucket`` partition columns + dynamic partition-overwrite, which
    gives the same idempotence guarantee (re-running a chunk rewrites
    exactly its own buckets, never duplicating rows) because the
    chunk → bucket mapping is deterministic.

Resumability protocol (reference analog: best-checkpoint save/restore,
`main_PG.py:210-218`; skip-counter lineage, `build_dataset.py:269-272`):
  1. the driver splits work into chunks (e.g. Iceberg partitions or
     doc_id ranges);
  2. each completed chunk commits its triples *and* a lineage row
     ``(chunk_id, n_pages, n_triples, n_dropped, wall_sec)`` in the
     same write;
  3. on restart, the job anti-joins pending chunks against committed
     lineage → only unfinished chunks re-run; re-running a finished
     chunk is a no-op overwrite of identical data.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = "chunk_id long, n_pages long, n_triples long, n_dropped long, wall_sec double"


def iceberg_merge_sql(target: str = "kg.edges", n_buckets: int = 256) -> str:
    """The MERGE used on a real Iceberg catalog (kept as the contract)."""
    return f"""
MERGE INTO {target} t
USING batch_triples s
ON t.subj = s.subj AND t.pred = s.pred AND t.obj = s.obj
WHEN MATCHED THEN UPDATE SET t.last_seen_ts = s.warc_ts
WHEN NOT MATCHED THEN INSERT *
-- target table: PARTITIONED BY (bucket({n_buckets}, subj))
"""


class BucketedParquetMerge:
    """Parquet fallback with MERGE-equivalent idempotence.

    Triples land under ``base/edges/chunk=<id>/`` (dynamic partition
    overwrite); the canonical edge table is the union of chunk
    partitions deduped on (subj, pred, obj) at read time via a view.
    Because chunk contents are a deterministic function of the input
    chunk, re-writing a chunk is idempotent.
    """

    def __init__(self, spark: SparkSession, base: str, n_buckets: int = 16):
        self.spark = spark
        self.base = base
        self.n_buckets = n_buckets
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # ---------------------------------------------------------- lineage
    def committed_chunks(self) -> DataFrame:
        path = f"{self.base}/lineage"
        try:
            return self.spark.read.parquet(path).select("chunk_id").distinct()
        except Exception:
            return self.spark.createDataFrame([], "chunk_id long")

    def pending_chunks(self, chunks: DataFrame) -> DataFrame:
        """Anti-join planned chunks against committed lineage (resume)."""
        return chunks.join(self.committed_chunks(), "chunk_id", "left_anti")

    # ------------------------------------------------------------ write
    def write_chunk(
        self, chunk_id: int, triples: DataFrame, n_pages: "int | Observation"
    ) -> dict:
        """Commit one chunk: triples partition + lineage row.

        The lineage row's n_triples comes from an `observe` metric
        collected DURING the write — never from a separate `count()`,
        which would re-execute the whole extraction stage per chunk
        (at scale that doubles the dominant cost of the job).
        `n_pages` may likewise be an Observation planted on the chunk's
        input DataFrame; it is read after the same single pass."""
        t0 = time.time()
        obs = Observation(f"chunk_{chunk_id}_triples")
        out = (
            triples.observe(obs, F.count(F.lit(1)).alias("n_triples"))
            .withColumn("chunk", F.lit(chunk_id))
            .withColumn("bucket", F.pmod(F.xxhash64("subj"), F.lit(self.n_buckets)))
        )
        (
            out.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("chunk", "bucket")
            .parquet(f"{self.base}/edges")
        )
        n_triples = obs.get["n_triples"]
        if isinstance(n_pages, Observation):
            n_pages = n_pages.get["n_pages"]
        wall = time.time() - t0
        row = [(chunk_id, n_pages, n_triples, 0, wall)]
        self.spark.createDataFrame(row, LINEAGE_SCHEMA).withColumn(
            "chunk", F.lit(chunk_id)
        ).write.mode("overwrite").partitionBy("chunk").parquet(f"{self.base}/lineage")
        return {"chunk_id": chunk_id, "n_pages": n_pages, "n_triples": n_triples, "wall_sec": wall}

    # ------------------------------------------------------------- read
    def edges(self) -> DataFrame:
        """Canonical edge view: chunk partitions deduped on the key."""
        return (
            self.spark.read.parquet(f"{self.base}/edges")
            .dropDuplicates(["subj", "pred", "obj"])
        )

    def entities(self) -> DataFrame:
        """Entity table derived from edges (id = stable hash of name)."""
        e = self.edges()
        names = e.select(F.col("subj").alias("canonical")).unionByName(
            e.select(F.col("obj").alias("canonical"))
        ).distinct()
        return names.withColumn("entity_id", F.abs(F.xxhash64("canonical")))

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.base}/lineage")


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    base: str,
    n_chunks: int = 4,
    extract=None,
) -> list[dict]:
    """Chunked, resumable extraction job: doc_id-range chunks → extract →
    commit (triples + lineage). Already-committed chunks are skipped.

    CONTRACT for a custom `extract` (ADVICE r2): it must be a pure plan
    transformation — no intermediate actions (count/isEmpty/cache-warm
    collect) on its input. The per-chunk `n_pages` Observation below is
    consumed by the FIRST action that executes the observed plan; an
    early action inside `extract` would freeze `n_pages` from that
    partial job instead of the chunk write, silently corrupting lineage
    rows. Trade-off, also deliberate: the observe node sits above the
    page scan, which blocks pushing a lang/category filter INSIDE
    `extract` down into the scan (observe is a pushdown barrier) — put
    input filters on `pages` before calling run_resumable so n_pages
    counts exactly what the chunk processed.
    """
    from ..pipeline import extract_pipeline

    from concurrent.futures import ThreadPoolExecutor

    extract = extract or (lambda df: extract_pipeline(df, use_html=True))
    sink = BucketedParquetMerge(spark, base)
    chunked = pages.withColumn("chunk_id", F.pmod(F.col("doc_id"), F.lit(n_chunks)))
    planned = chunked.select("chunk_id").distinct()
    todo = sorted(r.chunk_id for r in sink.pending_chunks(planned).collect())

    def _one(cid: int) -> dict:
        spark.sparkContext.setJobDescription(f"resumable chunk {cid}")
        part = chunked.filter(F.col("chunk_id") == cid).drop("chunk_id")
        # n_pages rides the same single pass as the chunk write: an
        # observe node below the extraction counts the chunk's input
        # rows while they stream through — no second scan.
        pages_obs = Observation(f"chunk_{cid}_pages")
        part = part.observe(pages_obs, F.count(F.lit(1)).alias("n_pages"))
        triples = extract(part)
        return sink.write_chunk(cid, triples, pages_obs)

    # Overlap the independent chunk jobs (guide §2.6): each chunk is a
    # separate scan→extract→write action whose tail would otherwise
    # leave the cluster idle; dynamic partition overwrite stages every
    # job under its own .spark-staging-<jobId> dir and each chunk
    # commits disjoint chunk=<id>/ partition dirs, so concurrent chunk
    # writes never touch the same destination. Job descriptions are
    # thread-local, so the UI labels each chunk correctly. Result order
    # stays chunk-id-sorted (pool.map preserves input order).
    if len(todo) > 1:
        with ThreadPoolExecutor(max_workers=min(4, len(todo))) as pool:
            results = list(pool.map(_one, todo))
    else:
        results = [_one(cid) for cid in todo]
    return results
