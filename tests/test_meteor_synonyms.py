"""METEOR synonym-module analog (operators/evalmetrics.py, syn stage).

The reference's eval gate scores METEOR through meteor-1.5.jar, whose
synonym module matches tokens sharing a WordNet synset
(webnlg_eval_scripts/metrics.py:4-56). The WordNet data ships with the
tool, not this container, so the analog takes a user-supplied
word → synonym-class mapping and matches residual tokens by equal
class — weighted 0.8 in the Fmean numerator per METEOR 1.5's module
weights, with the fragmentation penalty on the unweighted match count.
"""

import random

import pytest

from rdf_to_text_spark.operators.evalmetrics import (
    _meteor_align_beam,
    _meteor_align_py,
    _meteor_score_frac,
    corpus_meteor,
    meteor_py,
    meteor_stats,
)

SYN = {"car": "C1", "automobile": "C1", "auto": "C1", "fast": "C2", "quick": "C2"}


def test_syn_stage_matches_residual_only():
    # exact matches claim their tokens first; classes only pair leftovers
    h = "the car was fast".split()
    r = "the automobile was quick".split()
    assert _meteor_align_py(h, r) == (2, 2, 0, 0)  # 'the', 'was'
    assert _meteor_align_py(h, r, syn=SYN) == (4, 1, 0, 2)  # one run


def test_exact_priority_over_syn():
    # both tokens share a class AND appear exactly — exact stage wins,
    # m_syn stays 0 (module priority: exact before synonym)
    syn = {"a": "X", "b": "X"}
    assert _meteor_align_py("a b".split(), "b a".split(), syn=syn) == (2, 2, 0, 0)


def test_unmapped_tokens_never_syn_match():
    assert _meteor_align_py("cat".split(), "dog".split(), syn=SYN) == (0, 0, 0, 0)


def test_stem_then_syn_order():
    # 'running'~'runs' pairs in the stem stage, 'car'~'auto' in the syn
    # stage; the split records each stage's contribution
    h = "running car".split()
    r = "runs auto".split()
    m, c, ms, msy = _meteor_align_py(h, r, stem=True, syn=SYN)
    assert (m, ms, msy) == (2, 1, 1)


def test_score_weight_syn():
    from fractions import Fraction

    # m=2 (1 exact + 1 syn), hl=rl=2: m_w = 2 - 1/5 = 9/5,
    # fmean = 10*(9/5)/20 = 9/10, pen = 1/2*(1/2)^3 = 1/16
    s = _meteor_score_frac(2, 1, 2, 2, m_syn=1)
    assert s == Fraction(9, 10) * (1 - Fraction(1, 16))
    # weight ladder: exact 1.0 > synonym 0.8 > stem 0.6
    exact = _meteor_score_frac(2, 1, 2, 2)
    stem = _meteor_score_frac(2, 1, 2, 2, m_stem=1)
    assert exact > s > stem


def test_beam_syn_chunks_le_staged_and_m_invariant():
    rng = random.Random(7)
    words = ["car", "automobile", "auto", "fast", "quick", "dog", "cat"]
    for _ in range(200):
        h = [rng.choice(words) for _ in range(rng.randint(0, 10))]
        r = [rng.choice(words) for _ in range(rng.randint(0, 10))]
        m1, c1, _, _ = _meteor_align_py(h, r, syn=SYN)
        m2, c2 = _meteor_align_beam(h, r, syn=SYN)
        assert m2 == m1, (h, r)
        assert c2 <= c1, (h, r)


def test_beam_rejects_stem_plus_syn():
    with pytest.raises(ValueError):
        _meteor_align_beam(["a"], ["a"], stem=True, syn=SYN)


def test_meteor_stats_rejects_three_module_beam(spark):
    hdf = spark.createDataFrame([(0, "a")], ["id", "hyp"])
    rdf = spark.createDataFrame([(0, "a")], ["id", "ref"])
    with pytest.raises(ValueError):
        meteor_stats(hdf, rdf, minimize_chunks=True, stem_match=True, synonyms=SYN)


def test_meteor_stats_syn_spark_matches_twin(spark):
    rng = random.Random(11)
    words = ["car", "automobile", "auto", "fast", "quick", "dog", "w1", "w2"]
    hyps, refs = [], []
    for i in range(20):
        hyps.append(" ".join(rng.choice(words) for _ in range(rng.randint(1, 9))))
        refs.append(
            [
                " ".join(rng.choice(words) for _ in range(rng.randint(1, 9)))
                for _ in range(rng.randint(1, 3))
            ]
        )
    hdf = spark.createDataFrame(list(enumerate(hyps)), ["id", "hyp"])
    rdf = spark.createDataFrame(
        [(i, rf) for i, rl in enumerate(refs) for rf in rl], ["id", "ref"]
    )
    # dict path and DataFrame path must agree with the pure-python twin
    want = meteor_py(hyps, refs, synonyms=SYN)
    got = corpus_meteor(hdf, rdf, synonyms=SYN).collect()[0]
    syn_df = spark.createDataFrame(list(SYN.items()), ["word", "cls"])
    got_df = corpus_meteor(hdf, rdf, synonyms=syn_df).collect()[0]
    for row in (got, got_df):
        assert (row.m, row.m_syn, row.chunks) == (
            want["m"],
            want["m_syn"],
            want["chunks"],
        )
        assert (row.hyp_len, row.ref_len) == (want["hyp_len"], want["ref_len"])
        assert row.meteor == pytest.approx(want["meteor"])
    assert got.m_syn > 0  # fixture actually exercises the syn stage


def test_syn_noop_without_mapping(spark):
    hdf = spark.createDataFrame([(0, "the cat sat")], ["id", "hyp"])
    rdf = spark.createDataFrame([(0, "the cat sat")], ["id", "ref"])
    base = meteor_stats(hdf, rdf).collect()[0]
    syn = meteor_stats(hdf, rdf, synonyms={}).collect()[0]
    assert (base.m, base.chunks, base.m_syn) == (syn.m, syn.chunks, syn.m_syn) == (3, 1, 0)


def test_default_synonyms_preset(spark):
    from rdf_to_text_spark.operators.evalmetrics import (
        DEFAULT_SYNONYMS,
        meteor_stats,
    )

    hyps = spark.createDataFrame(
        [(1, "the big city is fast")], "id long, hyp string"
    )
    refs = spark.createDataFrame(
        [(1, "the large town is quick")], "id long, ref string"
    )
    row = meteor_stats(hyps, refs, synonyms="default").collect()[0]
    # 'the'/'is' exact; big~large, city~town, fast~quick via the table
    assert (row.m, row.m_syn) == (5, 3)
    assert DEFAULT_SYNONYMS["large"] == "big" and DEFAULT_SYNONYMS["town"] == "city"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="preset"):
        meteor_stats(hyps, refs, synonyms="wordnet").collect()
