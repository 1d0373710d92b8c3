"""Support-weighted fusion + constraint validation vs crafted inputs."""

from rdf_to_text_spark.operators.fusion import (
    constraint_violations,
    fuse_support_weighted,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, subj string, pred string, obj string"
    )


def test_fuse_picks_max_support_then_min_obj(spark):
    t = _triples(
        spark,
        [
            # s1/p1: obj "b" supported by 2 docs, "a" by 1 -> b wins
            (1, "s1", "p1", "b"),
            (2, "s1", "p1", "b"),
            (3, "s1", "p1", "a"),
            # s2/p1: tie 1-1 -> lexicographically smaller "x" wins
            (1, "s2", "p1", "x"),
            (2, "s2", "p1", "y"),
            # duplicate assertions in ONE doc count once
            (5, "s3", "p2", "q"),
            (5, "s3", "p2", "q"),
            (6, "s3", "p2", "r"),
            (7, "s3", "p2", "r"),
        ],
    )
    got = {
        (r.subj, r.pred): (r.fused_obj, r.support, r.n_alternatives, r.total_support)
        for r in fuse_support_weighted(t).collect()
    }
    assert got[("s1", "p1")] == ("b", 2, 2, 3)
    assert got[("s2", "p1")] == ("x", 1, 2, 2)
    # doc 5's repeat is one distinct doc; r has 2 docs and wins
    assert got[("s3", "p2")] == ("r", 2, 2, 3)


def test_constraint_violations_induced_on_trusted_only(spark):
    t = _triples(
        spark,
        [
            # p_fun: functional on the trusted (even-doc) slice...
            (2, "s1", "p_fun", "a"),
            (4, "s2", "p_fun", "b"),
            # ...but s1 gains a second object from an untrusted doc
            (3, "s1", "p_fun", "c"),
            # p_multi: already multi-valued in the trusted slice ->
            # never induced functional, so no violation reported
            (2, "s9", "p_multi", "m"),
            (2, "s9", "p_multi", "n"),
            (5, "s9", "p_multi", "o"),
        ],
    )
    out = constraint_violations(t, t.filter("doc_id % 2 = 0")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pred, r.subj, r.n_obj, r.obj_min, r.obj_max) == (
        "p_fun",
        "s1",
        2,
        "a",
        "c",
    )
