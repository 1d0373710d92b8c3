"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE on, skew-join on,
Arrow on, partition coalescing on); tests run the same configs on
``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rdf_to_text_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS or *]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        # AQE: runtime coalescing, skew-join splitting, dynamic join strategy.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow both ways: pandas UDFs and toPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Shuffle width: AQE coalesces down at runtime; this is the ceiling.
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))),
        )
        # Keep scans right-sized: at 100 TB this yields ~800k input splits,
        # each a comfortable 128 MB.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Broadcast threshold: alias dictionaries / vocab tables are
        # dictionary-sized; let AQE upgrade joins aggressively.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Crawl timestamps are UTC instants (WARC-Date, sitemap lastmod);
        # pin the session zone so wall-clock parse/format round-trips are
        # host-timezone-invariant. Catalog queries additionally parse
        # offsets explicitly (pattern XXX) so they stay correct even
        # under a driver-created session without this pin.
        .config("spark.sql.session.timeZone", "UTC")
        # Local mode: the driver IS the executor — size the heap for all
        # concurrent task buffers (measured: 8g chokes GC at 32 tasks of
        # Arrow traffic, halving throughput; 24g restores linear scaling).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    builder = builder.master(master or f"local[{cpus}]")
    return builder.getOrCreate()
