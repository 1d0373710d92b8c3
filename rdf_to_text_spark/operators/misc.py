"""Small reference-parity operators (SURVEY.md W1/W3/W4, P9/P10, K3/K4).

Each is a thin, tested DataFrame expression — listed individually so the
operator inventory is auditable line-by-line against the reference.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sort_within_partitions_by_length(
    df: DataFrame, col: str, desc: bool = True
) -> DataFrame:
    """W1: partition-local sort by token length (no shuffle) — the
    reference's sort-by-length batching (`data_loader.py:486`)."""
    key = F.size(F.split(F.col(col), r"\s+"))
    return df.sortWithinPartitions(key.desc() if desc else key.asc())


def seeded_pseudo_shuffle(df: DataFrame, salt: int = 10) -> DataFrame:
    """W3: deterministic corpus shuffle without RNG state.

    The reference co-shuffles src/trg/rplc with `random.seed(10)`
    (`webnlg_baseline_input.py:148-157`); rows here get a stable
    pseudo-random order from a salted hash of the whole row — the same
    permutation on every run and every cluster size.
    """
    return df.orderBy(F.xxhash64(F.to_json(F.struct(*df.columns)), F.lit(salt)))


def reverse_triples(df: DataFrame, arr_col: str = "triples") -> DataFrame:
    """W4: reverse triple order within an entry
    (`webnlg_baseline_input.py:130-133` `triples.reverse()`)."""
    return df.withColumn(arr_col, F.reverse(F.col(arr_col)))


def reorder_pred_first(triples: DataFrame) -> DataFrame:
    """P9: emit (pred, subj, obj) streams (`webnlg_re_input.py:253-277`)."""
    return triples.select("pred", "subj", "obj")


def token_position(df: DataFrame, text_col: str, word_col: str) -> DataFrame:
    """P10: first index of a token in the lex, -1 if absent
    (`webnlg_re_input.py:191-196` `lex.split(' ').index(word)`).

    `array_position` is 1-based with 0 for missing; the reference is
    0-based with -1 for missing — shift by one.
    """
    pos = F.array_position(F.split(F.col(text_col), " "), F.col(word_col))
    return df.withColumn("token_pos", (pos - 1).cast("int"))


def edge_labels(edges: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """G4 `getAllEdgeLabel`: multi-edge labels per (src, dst) pair
    (`EntityGraph.py:18-23`), deterministic order (W2)."""
    keys = keys or []
    return edges.groupBy(*keys, "src", "dst").agg(
        F.sort_array(F.collect_list("label")).alias("labels")
    )


# --------------------------------------------------------------- K3 / K4
def write_multi_ref_files(refs: DataFrame, out_dir: str) -> None:
    """K3: multi-reference eval layout — one row per (src, ref_idx, ref),
    written as `reference{j}` partitions (the reference writes
    reference0.lex..referenceN.lex, `webnlg_gcnonmt_input.py:239-248`).

    src rows with fewer refs than max simply have no row for that j —
    the reader treats missing as the reference's empty-line padding.
    """
    grouped = refs.groupBy("src").agg(F.sort_array(F.collect_list("trg")).alias("refs"))
    exploded = grouped.select("src", F.posexplode("refs").alias("ref_idx", "ref"))
    exploded.write.mode("overwrite").partitionBy("ref_idx").parquet(out_dir)


def write_vocab_json(vocab_df: DataFrame, word2id_path: str, id2word_path: str) -> None:
    """K4: vocab sinks — word2id dict + id-ordered word list
    (`build_vocab.py:53-57`). Vocabularies are dictionary-sized, so a
    driver-side collect is the correct plan."""
    rows = sorted(vocab_df.select("word", "vocab_id").collect(), key=lambda r: r.vocab_id)
    word2id = {r.word: r.vocab_id for r in rows}
    with open(word2id_path, "w") as f:
        json.dump(word2id, f)
    with open(id2word_path, "w") as f:
        json.dump([r.word for r in rows], f)
