"""Paragraph dedup, duplicated-span stats, and LM bucketing vs
hand-computed expectations (the crafted-input twin of the DuckDB
oracle sweep in test_extra_queries.py)."""

import hashlib

from pyspark.sql import functions as F

from rdf_to_text_spark.operators.dedup import paragraph_dedup
from rdf_to_text_spark.operators.text_analysis import (
    dup_span_stats,
    unigram_lm_buckets,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_paragraph_dedup_keeps_global_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),       # paras: "a b c", "d e f"
            (2, "a b c x y z"),       # "a b c" dup of (1,0); "x y z" first here
            (3, "x y z x y z"),       # both occurrences lose to (2,1)
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_paras, r.n_dropped, r.clean_md5)
        for r in paragraph_dedup(docs, chunk_tokens=3).collect()
    }
    assert got[1] == (2, 0, _md5("a b c d e f"))
    assert got[2] == (2, 1, _md5("x y z"))
    # within-doc repeats of an already-seen paragraph drop too
    assert got[3] == (2, 2, _md5(""))


def test_paragraph_dedup_short_tail_chunk(spark):
    """The trailing sub-chunk is a paragraph of its own: two docs
    sharing only the short tail dedup on it."""
    docs = spark.createDataFrame(
        [(1, "p q r s"), (2, "u v w s")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_paras, r.n_dropped, r.clean_md5)
        for r in paragraph_dedup(docs, chunk_tokens=3).collect()
    }
    # chunks: (1): "p q r", "s"; (2): "u v w", "s" — tail "s" kept in 1
    assert got[1] == (2, 0, _md5("p q r s"))
    assert got[2] == (2, 1, _md5("u v w"))


def test_dup_span_stats_runs_and_totals(spark):
    docs = spark.createDataFrame(
        [
            (1, "p q r s t"),   # bigrams: pq qr rs st
            (2, "q r s u v"),   # bigrams: qr rs su uv
            (3, "z z"),         # unique bigram
            (4, "w"),           # no bigram -> excluded
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_dup_pos, r.max_dup_run)
        for r in dup_span_stats(docs, n=2).collect()
    }
    # "q r" and "r s" occur in both docs 1 and 2, at adjacent positions
    assert got[1] == (4, 2, 2)
    assert got[2] == (4, 2, 2)
    assert got[3] == (1, 0, 0)
    assert 4 not in got


def test_dup_span_stats_split_runs(spark):
    """Two non-adjacent duplicated positions are two runs of 1."""
    docs = spark.createDataFrame(
        [
            (1, "a b x c d"),   # ab bx xc cd
            (2, "a b y c d"),   # ab by yc cd
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_dup_pos, r.max_dup_run)
        for r in dup_span_stats(docs, n=2).collect()
    }
    # shared grams: "a b" (pos 0) and "c d" (pos 3) — split runs
    assert got[1] == (4, 2, 1)
    assert got[2] == (4, 2, 1)


def test_unigram_lm_buckets_exact_terciles(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a"),
            (2, "a a b"),
            (3, "b b c"),
            (4, "c d e"),
            (5, "e e e"),
        ],
        "doc_id long, text string",
    )
    cleanup: list = []
    rows = unigram_lm_buckets(docs, cleanup=cleanup).collect()
    for h in cleanup:
        h.unpersist()
    got = {r.doc_id: (r.n_tok, r.sum_freq, r.scaled_score, r.bucket) for r in rows}
    # freqs: a=5 b=3 c=2 d=1 e=4
    assert got[1] == (3, 15, 5_000_000, "head")
    assert got[2] == (3, 13, 4_333_333, "head")   # floor division
    assert got[5] == (3, 12, 4_000_000, "middle")
    assert got[3] == (3, 8, 2_666_666, "middle")
    # N=5 -> NTILE(3) buckets of 2/2/1: rank 5 alone is tail
    assert got[4] == (3, 7, 2_333_333, "tail")


def test_bpe_encode_matches_python_replay(spark):
    """Distributed encode == the trainer's own merge loop applied
    word-by-word in pure Python (counts AND the in-order symbol md5)."""
    from rdf_to_text_spark.operators.text_analysis import (
        bpe_encode,
        bpe_learn_merges,
    )

    texts = {1: "low low low lower newest", 2: "newest newest widest low"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    merges = bpe_learn_merges(docs, n_merges=6)
    assert merges  # sanity: some merges learned

    def enc(word):
        syms = list(word)
        for _s, lft, rgt, _n in merges:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == lft and syms[i + 1] == rgt:
                    syms[i : i + 2] = [lft + rgt]
                else:
                    i += 1
        return syms

    got = {
        r.doc_id: (r.n_words, r.n_symbols, r.encoded_md5)
        for r in bpe_encode(docs, merges).collect()
    }
    for d, text in texts.items():
        words = text.split()
        encoded = [enc(w) for w in words]
        want_md5 = _md5(" ".join(" ".join(s) for s in encoded))
        assert got[d] == (len(words), sum(len(s) for s in encoded), want_md5), d


def test_bpe_encode_unmerged_word_stays_chars(spark):
    from rdf_to_text_spark.operators.text_analysis import bpe_encode

    docs = spark.createDataFrame([(1, "xyz ab")], "doc_id long, text string")
    got = bpe_encode(docs, [("a", "b")]).collect()[0]
    # "xyz" -> x y z (3 symbols), "ab" -> merged (1 symbol)
    assert (got.n_words, got.n_symbols) == (2, 4)
    assert got.encoded_md5 == _md5("x y z ab")
