"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The flagship (`kg_extract_triples`) is the full inverted pipeline:
synthesize Common-Crawl-shaped pages from ``documents.doc_id`` (pure
arithmetic contract, rdf_to_text_spark/fixtures.py), render text with the
reference's relexicalization semantics, then run extraction (template
bank + alias ladder). The oracle computes the *expected* triples from
doc_id arithmetic alone — a hash match validates the whole extraction
end-to-end, not just plumbing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_to_text_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline over sf0.001 pages."""
    return queries_catalog.kg_extract_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_catalog.QUERIES


def oracle_sql() -> dict[str, str]:
    return queries_catalog.ORACLES
