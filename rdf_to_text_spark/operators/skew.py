"""Skew handling: salted joins and two-phase aggregation.

WebNLG is uniform, but at Common-Crawl scale head entities (country
names, capital cities) dominate mention/linking keys (SURVEY.md §4.1:
the fixture generator plants a Zipf head entity in ~40% of pages to
exercise exactly this). Three mitigations, used by the engine:

1. AQE skew-join splitting (on by default, session.py) — the first
   line of defense, handles moderate skew with zero code.
2. :func:`salted_join` — explicit N-way salting for joins whose probe
   side has pathological keys and whose build side is too big to
   broadcast: replicate each build row N times with salt 0..N-1,
   scatter probe rows by random-but-deterministic salt, join on
   (key, salt). Turns one hot reducer into N warm ones.
3. Two-phase aggregation — Spark's hash aggregate already computes
   map-side partials for algebraic aggs; for `collect_list`-style
   holistic aggs :func:`salted_collect` pre-aggregates per (key, salt)
   then merges, bounding any single reducer's input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join on `key`.

    probe: the large/skewed side (each row gets ONE deterministic salt —
    a hash of the full row, so no RNG state and no row explosion);
    build: the smaller side (each row replicated `n_salts` times).
    Output equals ``probe.join(build, key, how)`` for inner/left joins.
    """
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*probe.columns), F.lit(n_salts))
    )
    salted_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_probe.join(salted_build, [key, "_salt"], how)
    return out.drop("_salt")


def salted_collect(
    df: DataFrame, key: str, value: str, n_salts: int = 8
) -> DataFrame:
    """collect_list with bounded reducers: per-(key, salt) partial lists,
    then a merge of ≤ n_salts partials per key. Output order within the
    list is normalized by sort (W2 determinism)."""
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sort_array(F.flatten(F.collect_list("_part"))).alias(f"{value}s"))
    )


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key counts + share of total for the hottest keys —
    what you run before deciding broadcast vs salt vs AQE-only."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    total = df.count()
    return (
        counts.withColumn("share", F.round(F.col("n") / F.lit(total), 4))
        .orderBy(F.desc("n"))
        .limit(top)
    )
