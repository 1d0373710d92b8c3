"""Streaming MinHash+LSH near-duplicate candidates.

The batch dedup ladder (operators/dedup.py) answers "which documents in
this corpus are near-dups". A training-data pipeline also needs the
INCREMENTAL form: documents arrive in crawl batches, and each new
document must be checked against everything already ingested without
recomputing history. This module lifts the ladder's candidate rung to
Structured Streaming:

  * signature + banding are the batch operators VERBATIM —
    ``minhash_signatures`` is a narrow Arrow-batched map and
    ``band_buckets`` a narrow projection, so both run unchanged on a
    streaming DataFrame (the same lift as the flagship's
    streaming/extract_stream.py);
  * the bucket self-join becomes ONE stateful operator:
    ``applyInPandasWithState`` keyed by (band, bucket), whose state is
    the ids already seen in that bucket. Each arriving id emits a
    candidate pair against every retained prior id, then joins the
    state. Within a micro-batch, ids are processed in sorted order so
    replay is deterministic.

Cap semantics, stated plainly: the batch rung drops over-``max_bucket``
buckets ENTIRELY (it sees final bucket sizes); a stream cannot know a
bucket's final size, so this operator uses the PREFIX cap — once a
bucket's state holds ``max_bucket`` ids, later arrivals emit nothing
and are not retained. On corpora where no bucket exceeds the cap the
two are provably identical (the stream≡batch test pins this); on
degenerate buckets the stream keeps the first-arrival clique where the
batch keeps nothing — both bound the bucket's pair volume at
O(max_bucket²).

Duplicate emissions: a pair colliding in several bands (or whose bucket
is revisited across batches — impossible for one pair, since both ids
of a pair meet in a bucket exactly once) is emitted once PER BAND it
shares; the batch rung dedups pairs globally. Downstream exact
verification (ngram_jaccard) is idempotent, so streaming consumers
either tolerate or ``dropDuplicates`` on materialization — the
invariant test compares distinct pair sets.

Scale shape: state per (band, bucket) key is ≤ max_bucket longs — the
engine checkpoints O(#non-singleton buckets · max_bucket) ids total,
partitioned by the bucket key (uniform by construction: xxhash64
buckets). No shuffle other than the stateful exchange on the bucket
key, which is exactly the batch join's shuffle key.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

PAIRS_SCHEMA = StructType(
    [
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("ids", ArrayType(LongType()))])


def _make_update(max_bucket: int):
    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ids = list(state.get[0]) if state.exists else []
        incoming: list = []
        for pdf in pdfs:
            incoming.extend(int(v) for v in pdf["doc_id"])
        incoming.sort()
        out_a: list = []
        out_b: list = []
        seen = set(ids)
        for new_id in incoming:
            if new_id in seen:
                continue  # replayed file after checkpoint recovery
            if len(ids) >= max_bucket:
                break  # prefix cap: bucket full, later arrivals dropped
            for prior in ids:
                lo, hi = (prior, new_id) if prior < new_id else (new_id, prior)
                out_a.append(lo)
                out_b.append(hi)
            ids.append(new_id)
            seen.add(new_id)
        state.update((ids,))
        if out_a:
            yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    return update


def streaming_minhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 128,
    portable_md5: bool = False,
) -> DataFrame:
    """Streaming documents → (doc_a, doc_b) candidate pairs (append).

    Same parameters, same signatures, same buckets as the batch
    ``minhash_lsh_candidates`` — only the bucket self-join is replaced
    by the incremental stateful emit described in the module docstring.
    ``portable_md5`` swaps in the SQL-replayable hash family
    (``minhash_signatures_md5``/``band_buckets_md5``) so a DuckDB
    oracle can replay the streamed candidate set exactly.
    """
    from ..operators.dedup import (
        band_buckets,
        band_buckets_md5,
        minhash_signatures,
        minhash_signatures_md5,
    )

    sig_fn = minhash_signatures_md5 if portable_md5 else minhash_signatures
    bb_fn = band_buckets_md5 if portable_md5 else band_buckets
    sigs = sig_fn(docs, text_col, id_col, num_perm, shingle_k)
    banded = bb_fn(sigs, bands, num_perm // bands, id_col)
    if id_col != "doc_id":
        banded = banded.withColumnRenamed(id_col, "doc_id")
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _make_update(max_bucket),
        PAIRS_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_minhash_candidates(
    spark,
    docs_dir: str,
    checkpoint_dir: str,
    schema=None,
    query_name: str = "minhash_candidates",
    max_files_per_trigger: int = 1,
    **kwargs,
):
    """File-stream parquet documents → streaming candidates → memory
    sink (append). ``max_files_per_trigger=1`` forces one micro-batch
    per file so bucket state genuinely accumulates across batches."""
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    pairs = streaming_minhash_candidates(docs, **kwargs)
    return (
        pairs.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
