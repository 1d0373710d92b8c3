"""Plan audits: pushdown, codegen, no row-wise Python (SURVEY §4 goals)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rdf_to_text_spark import fixtures
from rdf_to_text_spark.pipeline import extract_pipeline
from rdf_to_text_spark.plans.audit import (
    assert_no_rowwise_python,
    has_pushed_filter,
    python_eval_nodes,
    wholestage_codegen_ids,
)


@pytest.fixture(scope="module")
def pages_parquet(spark):
    d = tempfile.mkdtemp(prefix="plan_pages_")
    fixtures.pages_from_range(spark, 500, partitions=2).write.parquet(f"{d}/pages")
    yield f"{d}/pages"
    shutil.rmtree(d, ignore_errors=True)


def test_lang_filter_pushes_down_to_scan(spark, pages_parquet):
    """The lang='en' filter must reach the parquet scan as PushedFilters."""
    pages = spark.read.parquet(pages_parquet)
    triples = extract_pipeline(pages, use_html=True)
    assert has_pushed_filter(triples, "lang")


def test_column_pruning_reads_only_needed_columns(spark, pages_parquet):
    """The extraction path must not scan `text`/`warc_ts` when deriving
    from html — ReadSchema should include only the fused stage's inputs."""
    from rdf_to_text_spark.plans.audit import formatted_plan

    pages = spark.read.parquet(pages_parquet)
    triples = extract_pipeline(pages, use_html=True)
    plan = formatted_plan(triples)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    line = read_schema[0]
    assert "html" in line and "doc_id" in line
    assert "warc_ts" not in line and "text:" not in line.replace("text>", "")


def test_no_rowwise_python_anywhere(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    triples = extract_pipeline(pages, use_html=True)
    assert_no_rowwise_python(triples)
    nodes = python_eval_nodes(triples)
    assert "MapInPandas" in nodes  # the fused Arrow stage is present


def test_relational_queries_plan_shape(spark):
    """tpch_q1: predicate pushdown + map-side partial aggregation before
    the exchange (AQE wraps the plan, so codegen spans only appear in
    the executed plan; the partial_sum/PushedFilters markers are the
    plan-visible invariants)."""
    from rdf_to_text_spark.plans.audit import formatted_plan
    from rdf_to_text_spark.queries_catalog import tpch_q1

    df = tpch_q1(spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert_no_rowwise_python(df)


def test_broadcast_join_in_topk_query(spark):
    from rdf_to_text_spark.plans.audit import formatted_plan
    from rdf_to_text_spark.queries_catalog import top_orders_per_segment

    df = top_orders_per_segment(spark, "/root/testdata/sf0.001")
    assert "BroadcastHashJoin" in formatted_plan(df)
