"""Distributed global ranking — no single-partition window.

`row_number() OVER (ORDER BY ...)` with no PARTITION BY moves the whole
relation to ONE task (Spark warns loudly). Fine for dictionary-sized
inputs; wrong for a web-scale vocabulary where the long tail of rare
words is itself huge. This is the classic zipWithIndex construction in
DataFrame terms:

  1. `repartitionByRange` on the order — contiguous sorted buckets,
     balanced by sampling (no skew hot-spot);
  2. local row numbers per bucket (window partitioned by bucket id —
     every bucket is its own task);
  3. driver-side cumulative bucket offsets (one tiny collect of
     `n_buckets` counts) added back via a literal map.

The result is identical to the global window for any TOTAL order; ties
across a bucket boundary would be split arbitrarily, so `order_cols`
must be tie-free (append a unique column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_numbers(
    df: DataFrame,
    order_cols: list[Column],
    rn_col: str = "rn",
    num_partitions: int | None = None,
    small_threshold: int = 100_000,
    cleanup: list | None = None,
    pin_result: bool = False,
) -> DataFrame:
    """df + `rn_col` = 1-based global rank under `order_cols` (must be a
    total order).

    Hybrid, like connected_components' local finish: the bucket-offset
    machinery needs a size pass anyway, so inputs at or under
    `small_threshold` rows (measured from the bucket sizes) take the
    plain single-partition window — at dictionary scale the distributed
    path is pure fixed overhead, while at web scale the window is the
    bottleneck. Set small_threshold=0 to force the distributed path.

    CORRECTNESS NOTE — the range-partitioned frame MUST be persisted
    before the sizes pass: `repartitionByRange` samples its boundaries
    per execution (the sampler is seeded from the RDD id, which changes
    per job), so without the cache the sizes job and the output job
    could place a row in different buckets and the offsets would
    misalign — duplicate/skipped ranks. The persist pins one set of
    boundaries; it cannot be unpersisted before we return (the caller's
    action happens after), so by default the cache lives until session
    end — acceptable for rank-table-sized data. Many-vocabulary jobs
    should pass `cleanup`: the persisted handle is appended to it, and
    the caller unpersists after materializing the result
    (`for h in cleanup: h.unpersist()`).

    CLEANUP CONTRACT — after the cleanup handle is unpersisted, the
    returned DataFrame must NOT be executed again: a re-execution
    re-runs repartitionByRange with fresh sampled boundaries while the
    driver-side offset map stays frozen, silently producing duplicate/
    skipped ranks. Materialize exactly once (count/collect/write), then
    release. Callers that need a re-executable result pass
    `pin_result=True`: the output is localCheckpoint-ed (lazily) before
    returning, so once the first action materializes it, re-executions
    read the stored partitions and never touch the sampler again —
    at the cost of caching the full ranked output. The same contract
    applies to the MinHash signature handles in operators/dedup.py.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    if cleanup is not None:
        cleanup.append(ranged)
    sizes = {
        r._pid: r.n
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    def _finish(res: DataFrame) -> DataFrame:
        return res.localCheckpoint(eager=False) if pin_result else res

    if sum(sizes.values()) <= small_threshold:
        w = Window.orderBy(*order_cols)
        return _finish(
            ranged.drop("_pid").withColumn(
                rn_col, F.row_number().over(w).cast("long")
            )
        )
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    if not offsets:
        return df.withColumn(rn_col, F.lit(None).cast("long"))
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        ranged.withColumn("_local", F.row_number().over(w))
        .withColumn(rn_col, (omap[F.col("_pid")] + F.col("_local")).cast("long"))
        .drop("_pid", "_local")
    )
    return _finish(out)


def global_prefix_sums(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
    small_threshold: int = 100_000,
    cleanup: list | None = None,
    pin_result: bool = False,
) -> DataFrame:
    """df + `out_col` = INCLUSIVE global prefix sum of `value_col` under
    `order_cols` (must be a total order) — the cumsum sibling of
    global_row_numbers, same two-pass architecture:

      1. `repartitionByRange` on the order (contiguous sorted buckets);
      2. local running sum per bucket (window partitioned by bucket);
      3. driver-side cumulative BUCKET TOTALS (one tiny collect of
         n_buckets sums) added back via a literal map.

    This is how sequential arithmetic (token-budget shard packing,
    byte-offset assignment, exact quantile splits) scales: the only
    global object is the n_buckets-row offset table. The persist /
    cleanup / re-execution contract is identical to global_row_numbers
    (see its docstring) — boundaries are sampled per execution, so the
    ranged frame is pinned and the result must be materialized once
    unless `pin_result=True`.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    if cleanup is not None:
        cleanup.append(ranged)
    stats = ranged.groupBy("_pid").agg(
        F.count("*").alias("n"), F.sum(value_col).alias("s")
    ).collect()
    sizes = {r._pid: r.n for r in stats}

    def _finish(res: DataFrame) -> DataFrame:
        return res.localCheckpoint(eager=False) if pin_result else res

    if sum(sizes.values()) <= small_threshold:
        w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
        return _finish(
            ranged.drop("_pid").withColumn(
                out_col, F.sum(value_col).over(w).cast("long")
            )
        )
    offsets, acc = {}, 0
    for r in sorted(stats, key=lambda r: r._pid):
        offsets[r._pid] = acc
        acc += r.s or 0
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        ranged.withColumn("_local", F.sum(value_col).over(w))
        .withColumn(out_col, (omap[F.col("_pid")] + F.col("_local")).cast("long"))
        .drop("_pid", "_local")
    )
    return _finish(out)
