"""Vocabulary build vs the reference's Counter semantics (A1/A2)."""

import collections

from rdf_to_text_spark.operators.vocab import SPECIALS, build_vocab, word_counts


def _reference_get_words(lines):
    """Literal reimplementation of build_vocab.py:11-17."""
    words_box = []
    for line in lines:
        words_box.extend(line.replace(" < TSP > ", " ").replace(" | ", " ").lower().split())
    return collections.Counter(words_box)


LINES = [
    "Aarhus_Airport | cityServed | Aarhus",
    "ENTITIES_1 PLACE | location | ENTITIES_2 < TSP > ENTITIES_1 | country | Denmark",
    "the city is served by the airport",
    "the the the a a of",
]


def test_word_counts_match_counter(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "text string")
    got = {r.word: r.cnt for r in word_counts(df).collect()}
    exp = _reference_get_words(LINES)
    assert got == dict(exp)


def test_build_vocab_ranking(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "text string")
    rows = sorted(build_vocab(df).collect(), key=lambda r: r.vocab_id)
    # 7 specials first with ids 0..6 (build_vocab.py:36)
    assert [r.word for r in rows[:7]] == SPECIALS
    assert [r.vocab_id for r in rows[:7]] == list(range(7))
    # corpus words: contiguous ids from 7, ordered by (cnt desc, word asc)
    corpus = rows[7:]
    assert corpus[0].word == "the" and corpus[0].cnt == 5
    assert [r.vocab_id for r in corpus] == list(range(7, 7 + len(corpus)))
    cnts = [(-r.cnt, r.word) for r in corpus]
    assert cnts == sorted(cnts)


def test_global_row_numbers_equals_single_window(spark):
    """The distributed rank (range buckets + offsets) must equal the
    single-partition window for any total order."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rdf_to_text_spark.functions.ranking import global_row_numbers

    random.seed(7)
    rows = [(f"w{i:04d}", random.randrange(50)) for i in range(2000)]
    df = spark.createDataFrame(rows, "word string, cnt long")
    order = [F.col("cnt").desc(), F.col("word")]
    got = {
        r.word: r.rn
        for r in global_row_numbers(
            df, order, num_partitions=7, small_threshold=0  # force distributed path
        ).collect()
    }
    w = Window.orderBy(*order)
    exp = {r.word: r.rn for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    assert got == exp


def test_global_row_numbers_empty(spark):
    from pyspark.sql import functions as F

    from rdf_to_text_spark.functions.ranking import global_row_numbers

    df = spark.createDataFrame([], "word string, cnt long")
    assert global_row_numbers(df, [F.col("cnt")]).count() == 0


def test_global_row_numbers_pin_result_survives_cache_release(spark):
    """With pin_result=True the ranked output stays correct when it is
    re-executed AFTER the internal range-partition cache is released —
    the failure mode the cleanup contract forbids for unpinned results
    (repartitionByRange would resample boundaries against the frozen
    offset map)."""
    from pyspark.sql import functions as F

    from rdf_to_text_spark.functions.ranking import global_row_numbers

    df = spark.range(5000).select(
        F.col("id"), (F.col("id") * 37 % 1000).alias("k")
    )
    cleanup: list = []
    out = global_row_numbers(
        df, [F.col("k"), F.col("id")], num_partitions=8,
        small_threshold=0, cleanup=cleanup, pin_result=True,
    )
    first = {r.id: r.rn for r in out.collect()}  # materializes the pin
    for h in cleanup:
        h.unpersist()
    second = {r.id: r.rn for r in out.collect()}  # re-execution
    assert first == second
    assert sorted(first.values()) == list(range(1, 5001))
