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


def capped_entity_pairs(incidence: DataFrame, cap: int = 4) -> DataFrame:
    """Entity co-occurrence pairs with a per-document fan-out cap.

    ``incidence`` is (doc_id, entity) with one row per in-page mention
    (multiplicity = in-page support). Before the page-local self-join,
    each document keeps only its ``cap`` best-supported entities
    (support desc, entity asc — deterministic, W2): an adversarial page
    mentioning 10^4 entities would otherwise contribute 10^8 pairs to
    the shuffle, the classic quadratic blowup a 100 TB crawl cannot
    absorb. Output: (e1, e2, n_docs) with e1 < e2.

    Plan: one combiner groupBy for support, one per-doc window over at
    most the page's distinct entities, a page-keyed self-join bounded
    by cap², one combiner groupBy on the pair.
    """
    sup = incidence.groupBy("doc_id", "entity").agg(F.count(F.lit(1)).alias("sup"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("sup"), "entity")
    kept = (
        sup.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= cap)
        .select("doc_id", "entity")
    )
    a, b = kept.alias("a"), kept.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.entity") < F.col("b.entity")),
    )
    return pairs.groupBy(
        F.col("a.entity").alias("e1"), F.col("b.entity").alias("e2")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def link_with_prior(
    mentions: DataFrame,
    candidates: DataFrame,
    prior: DataFrame,
    anchor_prior: DataFrame | None = None,
    w_cooc: int = 1,
    w_anchor: int = 1,
    self_score: int | None = None,
) -> DataFrame:
    """Resolve ambiguous mentions with corpus-statistical priors.

    ``mentions``    : (doc_id, sent_idx, mention, anchor) — anchor is
                      an entity already resolved on the page (the
                      subject).
    ``candidates``  : (mention, entity) — the dictionary-sized alias
                      table; broadcast.
    ``prior``       : (e1, e2, n_docs) with e1 < e2 — corpus-wide
                      co-occurrence counts (capped_entity_pairs
                      output).
    ``anchor_prior``: optional (mention, entity, n_refs) — how often
                      the corpus uses this surface when referring to
                      this entity (the anchor-text signal: the web's
                      own names for a page, operators/webtext.py:
                      anchor_text_agg shape). Vocabulary-sized →
                      broadcast.

    Score(candidate) = w_cooc·n_docs(candidate, anchor)
                     + w_anchor·n_refs(mention, candidate); winner per
    (doc_id, sent_idx, mention) by (score desc, entity asc) — the W5
    top-1 idiom with W2-deterministic ties, so a context-free decoy
    ('Aarhus' the city for an 'aarhus' mention on an airport page)
    loses exactly when the signals say so, integer-exact.

    Self-candidates (entity == anchor) deliberately take no shortcut by
    default: the strict e1<e2 prior stores no self-pairs, so they score
    w_anchor·n_refs only. In the object-mention setting (mention = a
    triple's object surface, anchor = the page subject) this is the
    RIGHT semantics — a triple's object is never its own subject, so
    boosting the self-candidate would systematically mis-link. Callers
    linking subject-style mentions (where the page's own topic IS the
    likeliest referent) pass ``self_score`` to pin entity==anchor to a
    maximal constant.

    Plan: broadcast probe for candidates (no shuffle), one hash join
    keyed on the unordered pair, an optional second broadcast probe for
    the anchor prior, one per-mention window.
    """
    scored = mentions.join(F.broadcast(candidates), "mention").join(
        prior,
        (F.least("entity", "anchor") == prior["e1"])
        & (F.greatest("entity", "anchor") == prior["e2"]),
        "left",
    )
    score = F.lit(w_cooc) * F.coalesce("n_docs", F.lit(0))
    if anchor_prior is not None:
        scored = scored.join(
            F.broadcast(anchor_prior), ["mention", "entity"], "left"
        )
        score = score + F.lit(w_anchor) * F.coalesce("n_refs", F.lit(0))
    if self_score is not None:
        score = F.when(F.col("entity") == F.col("anchor"), F.lit(self_score)).otherwise(score)
    scored = scored.select(
        "doc_id",
        "sent_idx",
        "mention",
        "entity",
        score.cast("long").alias("score"),
    )
    w = Window.partitionBy("doc_id", "sent_idx", "mention").orderBy(
        F.desc("score"), "entity"
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
