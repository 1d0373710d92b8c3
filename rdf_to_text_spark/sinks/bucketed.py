"""Bucketed tables: shuffle-free co-located joins on the subject key.

north_rule: entity/edge tables are partitioned by subject hash bucket.
Beyond partition pruning, Spark's `bucketBy` gives *join co-location*:
two tables bucketed by the same key with the same bucket count join
with ZERO Exchange — at 100 TB this removes the dominant shuffle from
every edge⋈edge / edge⋈entity query.

Local demo + plan-audit test: write edges and entities with
``bucketBy(N, key)``, join them, assert no Exchange under the join in
the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Save as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket specs Catalyst plans a SortMergeJoin whose
    children read pre-bucketed files — no Exchange. Broadcast must be
    disabled for the demo join (otherwise the optimizer may prefer a
    broadcast and hide the co-location)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
