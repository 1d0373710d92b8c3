"""Catalog of driver-checkable queries (SURVEY.md §2 coverage).

Each entry pairs a Spark implementation with a DuckDB oracle over the
driver's pre-registered views (region nation customer supplier part
orders lineitem events documents embeddings). Column names/aliases match
exactly on both sides (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fixtures
from .pipeline import extract_pipeline

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ------------------------------------------------------------------ flagship
@_register("kg_extract_triples", fixtures.gold_triples_sql())
def kg_extract_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full inverted pipeline: render pages → extract → linked triples."""
    pages = fixtures.pages_from_documents(spark, sf_dir)
    triples = extract_pipeline(pages, use_html=True)
    return triples.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("int").alias("sent_idx"),
        "subj",
        "pred",
        "obj",
    )
