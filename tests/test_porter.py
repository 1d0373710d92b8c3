"""Porter stemmer (functions/porter.py) — pinned to the published
algorithm's own examples — and METEOR's stem matching stage."""

from __future__ import annotations

import random

from rdf_to_text_spark.functions.porter import porter_stem
from rdf_to_text_spark.operators.evalmetrics import (
    _meteor_align_py,
    meteor_py,
    meteor_stats,
)

# every example given in Porter (1980) for steps 1a-5b
PAPER_CASES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas", "controll": "control",
    "roll": "roll",
}


def test_porter_paper_examples():
    bad = {w: (porter_stem(w), want) for w, want in PAPER_CASES.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_porter_idempotent_on_common_words():
    rng = random.Random(5)
    words = list(PAPER_CASES) + ["running", "runs", "runner", "computes"]
    for w in rng.sample(words, 30):
        s = porter_stem(w)
        assert porter_stem(s) in (s, porter_stem(s))  # no crash; stable type
        assert isinstance(s, str) and s


def test_stem_stage_matches_residual_only():
    # exact matches claim their tokens first; stems only pair leftovers
    h = "the runner was running".split()
    r = "the runners run fast".split()
    assert _meteor_align_py(h, r) == (1, 1, 0, 0)  # 'the' only
    m, c, _ms, _msy = _meteor_align_py(h, r, stem=True)
    assert m == 3  # + runner~runners, running~run
    # m is bounded by min lengths and never decreases vs exact
    assert m <= min(len(h), len(r))


def test_stem_flag_is_noop_when_exact_covers_everything():
    h = "a b c".split()
    assert _meteor_align_py(h, h, stem=True) == _meteor_align_py(h, h) == (3, 1, 0, 0)


def test_meteor_stats_stem_spark_matches_twin(spark):
    hyps = ["the runner was running fast", "cats running", "x y z"]
    refs = [["the runners run fast"], ["cat runs", "dogs walked"], ["p q r"]]
    hdf = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hyps)], "id long, hyp string"
    )
    rdf = spark.createDataFrame(
        [(i, r) for i, rl in enumerate(refs) for r in rl], "id long, ref string"
    )
    got = {r.id: r for r in meteor_stats(hdf, rdf, stem_match=True).collect()}
    want = meteor_py(hyps, refs, stem_match=True)
    assert sum(r.m for r in got.values()) == want["m"]
    assert sum(r.chunks for r in got.values()) == want["chunks"]
    # and the exact-only run differs where stems matter
    base = {r.id: r for r in meteor_stats(hdf, rdf).collect()}
    assert got[0].m > base[0].m
    assert got[2].m == base[2].m == 0


def test_stem_beam_combines_with_chunk_minimization(spark):
    """minimize_chunks + stem_match compose: same m as two-stage rank
    pairing (stem classes subsume exact types, so max matching size is
    per-class min counts either way), chunks never more."""
    from rdf_to_text_spark.operators.evalmetrics import _meteor_align_beam

    rng = random.Random(31)
    vocab = ["run", "runs", "running", "cat", "cats", "walk", "walked"]
    for _ in range(100):
        h = [rng.choice(vocab) for _ in range(rng.randint(0, 8))]
        r = [rng.choice(vocab) for _ in range(rng.randint(0, 8))]
        m1, c1 = _meteor_align_py(h, r, stem=True)[:2]
        m2, c2 = _meteor_align_beam(h, r, stem=True)
        assert m2 == m1 and c2 <= c1, (h, r)
    # Spark operator accepts both flags together
    hdf = spark.createDataFrame([(0, "running cats walk")], "id long, hyp string")
    rdf = spark.createDataFrame([(0, "walked cat runs")], "id long, ref string")
    row = meteor_stats(hdf, rdf, minimize_chunks=True, stem_match=True).collect()[0]
    assert row.m == 3  # every token stem-matches


def test_meteor_module_weights_enter_score_not_penalty(spark):
    """METEOR 1.5 module weights: stem matches count 0.6 in the Fmean
    numerator (M_w = M - 0.4*M_stem) while the fragmentation penalty
    keeps the unweighted M — and the exact path (m_stem = 0) is the
    paper formula unchanged."""
    from fractions import Fraction

    from rdf_to_text_spark.operators.evalmetrics import (
        _meteor_score_frac,
        corpus_meteor,
    )

    # hand case: m=3 of which 2 stem matches, chunks=2, hl=rl=4
    w = _meteor_score_frac(3, 2, 4, 4, m_stem=2)
    unw = _meteor_score_frac(3, 2, 4, 4)
    assert w == unw * Fraction(5 * 3 - 2 * 2, 5 * 3)  # scale by m_w/m
    assert _meteor_score_frac(3, 2, 4, 4, m_stem=0) == unw

    hyps = ["the runner was running fast"]
    refs = [["the runners run fast"]]
    hdf = spark.createDataFrame([(0, hyps[0])], "id long, hyp string")
    rdf = spark.createDataFrame([(0, refs[0][0])], "id long, ref string")
    row = corpus_meteor(hdf, rdf, stem_match=True).collect()[0]
    want = meteor_py(hyps, refs, stem_match=True)
    assert (row.m, row.m_stem, row.chunks) == (want["m"], want["m_stem"], want["chunks"])
    assert abs(row.meteor - want["meteor"]) < 1e-12
    assert row.m_stem == 2  # runner~runners, running~run
    # weighted score sits strictly below the unweighted-analog score
    base = corpus_meteor(hdf, rdf).collect()[0]
    assert base.m_stem == 0
