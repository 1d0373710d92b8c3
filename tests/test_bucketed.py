"""Bucketed co-located join: no Exchange in the plan (SURVEY §4 goal)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rdf_to_text_spark import fixtures
from rdf_to_text_spark.pipeline import extract_pipeline
from rdf_to_text_spark.plans.audit import formatted_plan
from rdf_to_text_spark.sinks.bucketed import bucketed_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark):
    triples = extract_pipeline(fixtures.pages_from_range(spark, 500, partitions=4),
                               use_html=True)
    edges = triples.select("subj", "pred", "obj")
    entities = triples.select("subj").distinct().withColumn(
        "entity_id", F.abs(F.xxhash64("subj"))
    )
    write_bucketed(edges, "t_edges_bucketed", "subj", n_buckets=8, sort_by="subj")
    write_bucketed(entities, "t_entities_bucketed", "subj", n_buckets=8, sort_by="subj")
    try:
        # disable broadcast so the optimizer must exploit co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, "t_edges_bucketed", "t_entities_bucketed", "subj")
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        # and the result is correct
        n = j.count()
        expected = edges.join(entities, "subj").count()
        assert n == expected > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS t_edges_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_entities_bucketed")


def test_unbucketed_join_needs_exchange(spark):
    """Control: the same join on plain DataFrames shuffles."""
    a = spark.range(1000).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    b = spark.range(1000).select(F.col("id").alias("k"), F.lit(2).alias("y"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = formatted_plan(a.join(b, "k"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
