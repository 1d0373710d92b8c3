"""Incremental KG maintenance: fact-set delta between crawl snapshots.

A continuously-crawled corpus re-extracts its KG per crawl generation;
what downstream consumers need is the CHANGE set — which (subj, pred,
obj) facts appeared and which vanished per page — so entity/edge tables
can be patched with a MERGE instead of rebuilt (reference lifecycle
analog: the reference rebuilds its dataset pickles from scratch per run,
`benchmark_reader.py`; at 10^12 documents a rebuild is not an option).

Execution shape: union of the two extractions with presence flags, ONE
shuffle on the full fact key with map-side partial aggregation (max of
two 0/1 flags), then a flag-xor filter. The key includes the object, so
head-entity skew cannot concentrate a reducer the way a subj-only key
would; no join, no broadcast, no driver materialization — the delta of
two 100 TB extractions is itself a narrow aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triple_delta(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str] = ("doc_id",),
    facts: Sequence[str] = ("subj", "pred", "obj"),
) -> DataFrame:
    """Set-difference of fact tables in both directions.

    Returns (``*keys``, ``*facts``, change ∈ {'added', 'removed'}).
    Multiplicity is ignored (facts are sets): a fact mentioned twice in
    the old crawl and once in the new is unchanged. Symmetric by
    construction — new urls, vanished urls, and revised pages all fall
    out of the same xor.
    """
    cols = [*keys, *facts]
    o = old.select(*cols).withColumn("_o", F.lit(1)).withColumn("_n", F.lit(0))
    n = new.select(*cols).withColumn("_o", F.lit(0)).withColumn("_n", F.lit(1))
    agg = (
        o.unionByName(n)
        .groupBy(*cols)
        .agg(F.max("_o").alias("in_old"), F.max("_n").alias("in_new"))
    )
    return (
        agg.filter(F.col("in_old") != F.col("in_new"))
        .withColumn(
            "change",
            F.when(F.col("in_new") == 1, F.lit("added")).otherwise(F.lit("removed")),
        )
        .drop("in_old", "in_new")
    )
