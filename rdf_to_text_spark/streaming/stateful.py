"""Custom stateful streaming: running entity-mention counts.

The KG builder's incremental view: as crawl batches stream in, keep a
running per-entity mention count (the freshness signal entity-ranking
needs) without recomputing history. Implemented with
``applyInPandasWithState`` — the engine's one custom stateful operator:

  * key: entity (subject of an extracted triple);
  * state: (total_mentions, n_batches_seen);
  * output (update mode): one row per touched entity per micro-batch
    with the NEW running total.

Batch-equivalence invariant (tested): after a stream drains, the final
running total per entity equals the plain batch groupBy count — the
streaming operator is an incremental refinement of the same query.

Scale notes: state is partitioned by entity key, so the Zipf head
entities land on distinct state partitions; state size is O(distinct
entities), checkpointed by the engine. A production variant adds
state TTL (GroupStateTimeout) to age out cold entities.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("entity", StringType()),
        StructField("total_mentions", LongType()),
        StructField("batches_seen", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("total", LongType()),
        StructField("batches", IntegerType()),
    ]
)


def _update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (entity,) = key
    new = sum(len(pdf) for pdf in pdfs)
    if state.exists:
        total, batches = state.get
    else:
        total, batches = 0, 0
    total += new
    batches += 1
    state.update((total, batches))
    yield pd.DataFrame({"entity": [entity], "total_mentions": [total], "batches_seen": [batches]})


def running_entity_counts(triples: DataFrame) -> DataFrame:
    """Streaming triples → running per-subject mention totals (update mode)."""
    return (
        triples.groupBy("subj")
        .applyInPandasWithState(
            _update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_running_counts(
    spark,
    pages_dir: str,
    checkpoint_dir: str,
    query_name: str = "running_entity_counts",
    max_files_per_trigger: int = 1,
):
    """File-stream pages → extraction → stateful running counts →
    in-memory sink (update mode). `max_files_per_trigger=1` forces one
    micro-batch per input file so state genuinely accumulates."""
    from ..fixtures import PAGES_SCHEMA
    from ..pipeline import extract_pipeline

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    triples = extract_pipeline(pages, use_html=True)
    counts = running_entity_counts(triples)
    return (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
