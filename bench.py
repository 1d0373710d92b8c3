#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall-clock of the headline queries (excluding JVM
startup). Per-query seconds go under "queries". Extra observability
fields (docs_per_sec, triples_per_sec) ride along — the driver ignores
unknown keys.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    from rdf_to_text_spark.session import get_spark
    from rdf_to_text_spark import queries_catalog

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    # warm the JVM + Python workers so per-query times are steady-state
    spark.range(1000).selectExpr("sum(id)").collect()

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    headline = [
        name
        for name in (
            "kg_extract_triples",
            "kg_vocab_topk",
            "kg_levi_edges",
            "kg_triple_support",
            "dedup_groups",
            "dedup_minhash_pairs",
            "text_quality",
            "ann_cosine_topk",
            "tpch_q1",
            "top_orders_per_segment",
        )
        if name in queries_catalog.QUERIES
    ]
    for name in headline:
        fn = queries_catalog.QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        if name == "kg_extract_triples":
            docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
            extras["docs_per_sec"] = round(docs / dt, 1)
            extras["triples_per_sec"] = round(n / dt, 1)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # never leave the driver without a JSON line
        print(json.dumps({"metric": "headline_queries_wall_sec", "value": -1.0,
                          "unit": "sec", "queries": {}, "sf": -1.0,
                          "error": str(exc)[:500]}))
        sys.exit(1)
