"""ROUGE-L: LCS kernel parity vs a textbook DP, and the multi-ref
max-F selection rule (Lin 2004 sentence-level ROUGE-L)."""

import random

from rdf_to_text_spark.operators.evalmetrics import (
    _lcs_len,
    corpus_rouge_l,
    rouge_l_stats,
)


def _lcs_ref(a, b):
    """Textbook O(nm) two-row DP — the parity oracle for _lcs_len."""
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(max(prev[j], cur[j - 1], prev[j - 1] + (x == y)))
        prev = cur
    return prev[-1]


def test_lcs_crafted():
    assert _lcs_len(list("abcde"), list("ace")) == 3
    assert _lcs_len(list("ace"), list("abcde")) == 3
    assert _lcs_len([], list("abc")) == 0
    assert _lcs_len(list("abc"), []) == 0
    assert _lcs_len(list("abc"), list("abc")) == 3
    assert _lcs_len(list("abc"), list("xyz")) == 0
    # repeats: the cummax row must not double-count one hyp token
    assert _lcs_len(list("aba"), list("bab")) == 2
    assert _lcs_len(list("aaaa"), list("aa")) == 2
    assert _lcs_len("the cat sat".split(), "the fat cat never sat".split()) == 3


def test_lcs_fuzz_parity():
    rng = random.Random(20260818)
    for _ in range(300):
        a = [rng.choice("abcd") for _ in range(rng.randrange(0, 15))]
        b = [rng.choice("abcd") for _ in range(rng.randrange(0, 15))]
        assert _lcs_len(a, b) == _lcs_ref(a, b), (a, b)


def test_rouge_l_multi_ref_picks_max_f(spark):
    # ref1 scores F = 2*2/(3+3) = 0.667; ref2 scores 2*3/(3+5) = 0.75
    hyps = spark.createDataFrame([(1, "a b c")], "id long, hyp string")
    refs = spark.createDataFrame(
        [(1, "a b x"), (1, "a b c d e")], "id long, ref string"
    )
    [row] = rouge_l_stats(hyps, refs).collect()
    assert (row.lcs, row.hyp_len, row.ref_len) == (3, 3, 5)


def test_rouge_l_empty_and_null(spark):
    hyps = spark.createDataFrame([(1, None), (2, "a b")], "id long, hyp string")
    refs = spark.createDataFrame([(1, "a b"), (2, "   ")], "id long, ref string")
    got = {r.id: (r.lcs, r.hyp_len, r.ref_len) for r in rouge_l_stats(hyps, refs).collect()}
    assert got == {1: (0, 0, 2), 2: (0, 2, 0)}


def test_corpus_rouge_l(spark):
    hyps = spark.createDataFrame(
        [(1, "a b c"), (2, "x y")], "id long, hyp string"
    )
    refs = spark.createDataFrame(
        [(1, "a b c"), (2, "x z")], "id long, ref string"
    )
    [row] = corpus_rouge_l(hyps, refs).collect()
    # lcs = 3 + 1, hyp_len = 5, ref_len = 5 -> F1 = 8/10
    assert (row.lcs, row.hyp_len, row.ref_len) == (4, 5, 5)
    assert abs(row.f1 - 0.8) < 1e-12
