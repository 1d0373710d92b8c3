"""Entity linking: candidate generation + TF-IDF cosine rerank.

Inverts J6 (SURVEY.md): the reference nested-loops every alias of a
category over each example (`webnlg_baseline_input.py:68-97`); we
generate candidates from the broadcast alias index (exact / lowercase /
paren-stripped ladder, `:84-95`) and — when a surface is ambiguous
across entities — rerank candidates by TF-IDF cosine between the
mention's sentence context and each entity's alias+context profile,
inside one Arrow-batched pandas UDF. Top-1 per mention uses the W5
window idiom (`row_number ≤ 1`).

Scale notes: candidates come from a broadcast dict probe (no shuffle);
the rerank is a narrow map; only the final dedup groups by mention id.
Head entities (Zipf skew) cost nothing extra here because scoring is
per-row, not per-key.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.textnorm import clean_surface
from ..templates import ENTITIES, OBJ_POOLS, surface_variants


def ambiguous_alias_index() -> dict[str, list[str]]:
    """surface → ALL candidate canonical entities (not just the first).

    Unlike templates.build_alias_index (first-wins for the gold path),
    this keeps every candidate so the reranker has work to do.
    """
    idx: dict[str, list[str]] = {}
    for names in list(ENTITIES.values()) + [
        v for k, v in OBJ_POOLS.items() if k not in ("City", "Airport")
    ]:
        for name in names:
            for v in surface_variants(name):
                cands = idx.setdefault(v, [])
                if name not in cands:
                    cands.append(name)
    return idx


def _profile(entity: str) -> Counter:
    """Entity token profile: tokens of every alias surface."""
    c: Counter = Counter()
    for v in surface_variants(entity):
        c.update(v.lower().split())
    c.update(clean_surface(entity).lower().split())
    return c


def _cosine(a: Counter, b: Counter) -> float:
    dot = sum(v * b.get(k, 0) for k, v in a.items())
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    return dot / (na * nb) if na and nb else 0.0


LINKED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mention", StringType()),
        StructField("context", StringType()),
        StructField("entity", StringType()),
        StructField("score", DoubleType()),
    ]
)


def link_mentions_reranked(mentions: DataFrame) -> DataFrame:
    """mentions(doc_id, mention, context) → best entity per mention.

    Ladder: exact → lowercase → paren-stripped candidates; ties broken
    by TF-IDF-style cosine between context tokens and entity profile,
    then lexicographic entity name (W2 determinism).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = ambiguous_alias_index()
        profiles: dict[str, Counter] = {}
        for pdf in batches:
            rows = []
            for doc_id, mention, context in zip(pdf["doc_id"], pdf["mention"], pdf["context"]):
                cands = (
                    idx.get(mention)
                    or idx.get(mention.lower())
                    or idx.get(mention.split("(")[0].strip())
                    or []
                )
                if not cands:
                    continue
                ctx = Counter((context or "").lower().split())
                best_ent, best_score = None, -1.0
                for ent in sorted(cands):  # deterministic tie order (W2)
                    prof = profiles.get(ent)
                    if prof is None:
                        prof = profiles[ent] = _profile(ent)
                    s = _cosine(ctx, prof)
                    if s > best_score:
                        best_ent, best_score = ent, s
                rows.append((int(doc_id), mention, context, best_ent, float(best_score)))
            yield pd.DataFrame(rows, columns=[f.name for f in LINKED_SCHEMA.fields])

    return mentions.select("doc_id", "mention", "context").mapInPandas(run, LINKED_SCHEMA)


def top1_per_mention(scored: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """W5 idiom: best candidate per mention by (score desc, entity asc)."""
    keys = keys or ["doc_id", "mention"]
    w = Window.partitionBy(*keys).orderBy(F.desc("score"), "entity")
    return scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
