"""Distributed corpus BLEU vs the multi-bleu.perl semantics twin."""

import math

import pytest

from rdf_to_text_spark.operators.evalmetrics import corpus_bleu, corpus_bleu_py


CASES = [
    # (hyps, multi-refs)
    (
        ["the cat sat on the mat", "a quick brown fox"],
        [
            ["the cat sat on the mat", "a cat was sitting on the mat"],
            ["the quick brown fox", "a fast brown fox jumped"],
        ],
    ),
    (
        ["entities_1 serves the city of entities_2 ."],
        [
            ["entities_1 serves the city of entities_2 ."],
            ["the city entities_2 is served by entities_1 ."],
        ],
    ),
    # short hyp -> brevity penalty kicks in
    (["brown fox"], [["the quick brown fox jumps today"]]),
    # no 4-gram overlap at all -> bleu 0, not NaN
    (["alpha beta gamma delta"], [["one two three four five"]]),
    # repeated-token clipping: 'the the the' vs single 'the' in ref
    (["the the the the"], [["the cat", "the dog sat"]]),
]


def _spark_bleu(spark, hyps, refs):
    hdf = spark.createDataFrame(list(enumerate(hyps)), "id long, hyp string")
    rrows = [(i, rf) for i, rlist in enumerate(refs) for rf in rlist]
    rdf = spark.createDataFrame(rrows, "id long, ref string")
    return corpus_bleu(hdf, rdf).collect()[0]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_corpus_bleu_matches_python_twin(spark, case_idx):
    hyps, refs = CASES[case_idx]
    got = _spark_bleu(spark, hyps, refs)
    exp = corpus_bleu_py(hyps, refs)
    assert got.hyp_len == exp["hyp_len"]
    assert got.ref_len == exp["ref_len"]
    for n in range(1, 5):
        assert got[f"p{n}"] == pytest.approx(exp["ps"][n - 1], abs=1e-12)
    assert got.bp == pytest.approx(exp["bp"], abs=1e-12)
    assert got.bleu == pytest.approx(exp["bleu"], abs=1e-12)


def test_perfect_hypothesis_scores_one(spark):
    hyps = ["the cat sat on the mat today ok"]
    refs = [["the cat sat on the mat today ok", "something else entirely here"]]
    got = _spark_bleu(spark, hyps, refs)
    assert got.bleu == pytest.approx(1.0)
    assert got.bp == 1.0


def test_known_value_single_pair(spark):
    """Hand-computed: hyp 'a b c d', ref 'a b c e' →
    p1=3/4, p2=2/3, p3=1/2, p4=0 → BLEU 0."""
    got = _spark_bleu(spark, ["a b c d"], [["a b c e"]])
    assert (got.p1, got.p2, got.p3) == (0.75, 2 / 3, 0.5)
    assert got.p4 == 0.0 and got.bleu == 0.0


def test_brevity_penalty_formula(spark):
    got = _spark_bleu(spark, ["brown fox"], [["the quick brown fox jumps today"]])
    assert got.bp == pytest.approx(math.exp(1 - 6 / 2))


def test_refless_hypotheses_contribute_nothing(spark):
    """A hypothesis id with no reference rows must not inflate the
    precision denominators or the length sums (review regression)."""
    hyps = ["the cat sat on the mat", "orphan hypothesis with no refs"]
    refs = [["the cat sat on the mat today"]]  # only id 0 has refs
    hdf = spark.createDataFrame(list(enumerate(hyps)), "id long, hyp string")
    rdf = spark.createDataFrame([(0, refs[0][0])], "id long, ref string")
    got = corpus_bleu(hdf, rdf).collect()[0]
    exp = corpus_bleu_py(hyps[:1], refs)  # twin sees only the ref'd pair
    assert got.hyp_len == exp["hyp_len"]
    assert got.ref_len == exp["ref_len"]
    for n in range(1, 5):
        assert got[f"p{n}"] == pytest.approx(exp["ps"][n - 1], abs=1e-12)
    assert got.bleu == pytest.approx(exp["bleu"], abs=1e-12)
