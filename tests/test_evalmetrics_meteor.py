"""METEOR analog: rank-paired exact matching + chunk penalty.

Pins the alignment kernel to an independent per-token zip construction,
the Spark operator (best-ref selection included) to the pure twin, and
the corpus formula to hand-computed cases. Simplifications vs the
METEOR tool (no chunk-minimizing search, no stem/synonym modules) are
documented in the operator docstring.
"""

from __future__ import annotations

import random

import pytest

from rdf_to_text_spark.operators.evalmetrics import (
    _meteor_align_py,
    _meteor_score_frac,
    corpus_meteor,
    meteor_py,
    meteor_stats,
)


def _align_spec(htoks, rtoks):
    """Independent construction: per-token zip of occurrence positions
    (the SQL oracle's rank-join), then predecessor-set chunk count."""
    from collections import defaultdict

    hpos, rpos = defaultdict(list), defaultdict(list)
    for i, t in enumerate(htoks):
        hpos[t].append(i)
    for j, t in enumerate(rtoks):
        rpos[t].append(j)
    pairs = set()
    for t in hpos:
        for i, j in zip(hpos[t], rpos.get(t, [])):
            pairs.add((i, j))
    chunks = sum(1 for (i, j) in pairs if (i - 1, j - 1) not in pairs)
    return len(pairs), chunks


@pytest.mark.parametrize(
    "h,r,want_m,want_chunks",
    [
        ("the cat sat", "the cat sat", 3, 1),
        ("the cat sat", "sat cat the", 3, 3),
        ("a b c d", "a b x d", 3, 2),
        ("a a b", "a b", 2, 2),  # 2nd 'a' unmatched; (0,0),(2,1) not a run
        ("x y", "p q", 0, 0),
        ("", "a", 0, 0),
    ],
)
def test_align_directed(h, r, want_m, want_chunks):
    assert _meteor_align_py(h.split(), r.split()) == (want_m, want_chunks, 0, 0)


def test_align_fuzz_vs_spec():
    rng = random.Random(13)
    alpha = ["a", "b", "c", "d"]
    for _ in range(300):
        h = [rng.choice(alpha) for _ in range(rng.randint(0, 12))]
        r = [rng.choice(alpha) for _ in range(rng.randint(0, 12))]
        assert _meteor_align_py(h, r)[:2] == _align_spec(h, r), (h, r)


def test_score_formula_exact():
    from fractions import Fraction

    # identical 3-token strings: P=R=1, Fmean=10/10=1, pen=0.5*(1/3)^3
    s = _meteor_score_frac(3, 1, 3, 3)
    assert s == Fraction(10 * 3 * (2 * 27 - 1), 2 * 27 * (3 + 27))
    assert s == 1 - Fraction(1, 54)
    assert _meteor_score_frac(0, 0, 5, 5) == 0


def test_best_ref_prefers_higher_score():
    # identical ref (1 chunk) must beat the scrambled ref (3 chunks)
    out = meteor_py(["the cat sat"], [["sat cat the", "the cat sat"]])
    assert (out["m"], out["chunks"]) == (3, 1)


def test_spark_matches_twin(spark):
    rng = random.Random(3)
    alpha = ["w1", "w2", "w3", "w4", "w5"]
    hyps, refs = [], []
    for i in range(25):
        hyps.append(" ".join(rng.choice(alpha) for _ in range(rng.randint(1, 10))))
        refs.append(
            [
                " ".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
                for _ in range(rng.randint(1, 3))
            ]
        )
    hdf = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hyps)], "id long, hyp string"
    )
    rdf = spark.createDataFrame(
        [(i, r) for i, rl in enumerate(refs) for r in rl], "id long, ref string"
    )
    got = corpus_meteor(hdf, rdf).collect()[0]
    want = meteor_py(hyps, refs)
    for k in ("m", "chunks", "hyp_len", "ref_len"):
        assert got[k] == want[k], k
    assert abs(got["meteor"] - want["meteor"]) < 1e-12


def test_hyp_without_ref_dropped(spark):
    hdf = spark.createDataFrame([(0, "a b"), (1, "c d")], "id long, hyp string")
    rdf = spark.createDataFrame([(0, "a b")], "id long, ref string")
    rows = meteor_stats(hdf, rdf).collect()
    assert [(r["id"], r["m"]) for r in rows] == [(0, 2)]


def test_meteor_null_text_and_empty_input(spark):
    """NULL text tokenizes to empty (m=0, score 0) instead of crashing;
    empty input aggregates to zeros, not NULLs."""
    hdf = spark.createDataFrame([(0, None), (1, "a b")], "id long, hyp string")
    rdf = spark.createDataFrame([(0, "a b"), (1, None)], "id long, ref string")
    rows = {r.id: r for r in meteor_stats(hdf, rdf).collect()}
    assert (rows[0].m, rows[0].hyp_len, rows[0].ref_len) == (0, 0, 2)
    assert (rows[1].m, rows[1].hyp_len, rows[1].ref_len) == (0, 2, 0)
    empty = corpus_meteor(
        spark.createDataFrame([(9, "x")], "id long, hyp string"),
        spark.createDataFrame([], "id long, ref string"),
    ).collect()[0]
    assert (empty.meteor, empty.m, empty.chunks) == (0.0, 0, 0)


# ---------------------------------------------- chunk-minimizing beam
def test_beam_reduces_chunks_vs_rank_pairing():
    """A case where the rank-paired maximum matching is NOT
    chunk-minimal: hyp 'a a b' vs ref 'a b a'. Rank pairing gives
    (0,0),(1,2),(2,1) = 3 chunks; pairing a@0->r2, a@1->r0 makes
    (1,0),(2,1) consecutive = 2 chunks, same m."""
    from rdf_to_text_spark.operators.evalmetrics import _meteor_align_beam

    h, r = "a a b".split(), "a b a".split()
    assert _meteor_align_py(h, r) == (3, 3, 0, 0)
    assert _meteor_align_beam(h, r) == (3, 2)


def test_beam_fuzz_same_m_never_more_chunks():
    from rdf_to_text_spark.operators.evalmetrics import _meteor_align_beam

    rng = random.Random(11)
    alpha = ["a", "b", "c"]
    for _ in range(150):
        h = [rng.choice(alpha) for _ in range(rng.randint(0, 9))]
        r = [rng.choice(alpha) for _ in range(rng.randint(0, 9))]
        m_rank, c_rank = _meteor_align_py(h, r)[:2]
        m_beam, c_beam = _meteor_align_beam(h, r)
        assert m_beam == m_rank, (h, r)
        assert 0 <= c_beam <= c_rank, (h, r)
        assert (m_beam == 0) == (c_beam == 0), (h, r)


def test_beam_flag_matches_default_when_rank_is_minimal(spark):
    """On inputs with no repeated tokens the maximum matching is unique,
    so minimize_chunks=True must reproduce the default path exactly
    (the driver-oracle fixtures are in this regime for most rows)."""
    hyps = ["w1 w2 w3 w4", "w2 w4", "w5 w1 w3"]
    refs = [["w1 w3 w4", "w4 w2 w1"], ["w2 w4"], ["w1 w5"]]
    hdf = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hyps)], "id long, hyp string"
    )
    rdf = spark.createDataFrame(
        [(i, r) for i, rl in enumerate(refs) for r in rl], "id long, ref string"
    )
    base = {r.id: r for r in meteor_stats(hdf, rdf).collect()}
    beam = {r.id: r for r in meteor_stats(hdf, rdf, minimize_chunks=True).collect()}
    assert base.keys() == beam.keys()
    for i in base:
        assert tuple(base[i]) == tuple(beam[i]), i
    # twin agrees under the flag too
    assert meteor_py(hyps, refs, minimize_chunks=True) == meteor_py(hyps, refs)
