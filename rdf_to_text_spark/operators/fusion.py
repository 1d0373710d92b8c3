"""Knowledge fusion + constraint validation over the constructed KG.

After extraction (many documents asserting overlapping facts), a KG
builder needs two more steps the reference's single-corpus pipeline
never faces at web scale:

  * FUSION — the same (subject, predicate) carries conflicting objects
    across pages; pick one canonical object per key, weighted by how
    many independent documents support it (the Knowledge-Vault-style
    "support-weighted truth finding" step, reduced to its exact
    integer core so a second engine can replay it under a hash).
  * CONSTRAINT VALIDATION — induce cardinality constraints on a
    trusted slice of the corpus (cf. operators/canonicalize.py and
    kg_schema_classes for the induction), then flag facts in the full
    corpus that violate them. This is how a curator finds extraction
    and linking errors without gold labels.

Both are pure DataFrame aggregates — vocabulary-to-entity-sized keys,
combiner-friendly, no UDFs, no single-partition exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuse_support_weighted(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    doc_col: str = "doc_id",
) -> DataFrame:
    """One canonical object per (subj, pred): the object asserted by
    the most distinct documents, ties broken by the lexicographically
    smallest object (deterministic, collation-free on ASCII keys).

    Output: (subj, pred, fused_obj, support, n_alternatives,
    total_support) — support counts distinct docs for the winner,
    n_alternatives the distinct objects seen, total_support the
    distinct (doc, obj) assertions across all alternatives.

    Plan: one combiner groupBy on (subj, pred, obj) with a distinct-doc
    count, then a (subj, pred)-partitioned window over the ALREADY
    AGGREGATED alternatives — after the first aggregate a hot key has
    at most |object vocabulary| rows, so the window partitions are
    bounded regardless of corpus size.
    """
    support = (
        triples.groupBy(subj_col, pred_col, obj_col)
        .agg(F.countDistinct(doc_col).alias("support"))
    )
    w = Window.partitionBy(subj_col, pred_col).orderBy(
        F.col("support").desc(), F.col(obj_col)
    )
    return (
        support.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_alternatives",
            F.count(F.lit(1)).over(Window.partitionBy(subj_col, pred_col)),
        )
        .withColumn(
            "total_support",
            F.sum("support").over(Window.partitionBy(subj_col, pred_col)),
        )
        .filter(F.col("_rn") == 1)
        .select(
            subj_col,
            pred_col,
            F.col(obj_col).alias("fused_obj"),
            "support",
            "n_alternatives",
            "total_support",
        )
    )


def constraint_violations(
    triples: DataFrame,
    trusted: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Functional-predicate violations: induce the set of predicates
    that are functional (every subject has exactly one object) on the
    TRUSTED slice, then report (pred, subj) groups in the full corpus
    that carry >= 2 distinct objects under an induced-functional
    predicate.

    Output: (pred, subj, n_obj, obj_min, obj_max) — the min/max
    conflicting objects make the violation row self-describing without
    carrying an unbounded list.

    Plan: both sides are (pred, subj)-keyed distinct-count aggregates;
    the induced-functional predicate set is vocabulary-sized and
    broadcast onto the full-corpus aggregate.
    """
    induced = (
        trusted.groupBy(pred_col, subj_col)
        .agg(F.countDistinct(obj_col).alias("_n"))
        .groupBy(pred_col)
        .agg(F.max("_n").alias("_m"))
        .filter(F.col("_m") == 1)
        .select(pred_col)
    )
    grouped = (
        triples.groupBy(pred_col, subj_col)
        .agg(
            F.countDistinct(obj_col).alias("n_obj"),
            F.min(obj_col).alias("obj_min"),
            F.max(obj_col).alias("obj_max"),
        )
        .filter(F.col("n_obj") >= 2)
    )
    return grouped.join(F.broadcast(induced), pred_col).select(
        pred_col, subj_col, "n_obj", "obj_min", "obj_max"
    )
