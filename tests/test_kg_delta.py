"""Unit semantics of operators/kg_delta.triple_delta (the oracle sweep
in test_extra_queries.py pins the end-to-end crawl-delta query)."""

from rdf_to_text_spark.operators.kg_delta import triple_delta


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, subj string, pred string, obj string"
    )


def test_delta_added_removed_and_multiplicity_ignored(spark):
    old = _df(
        spark,
        [
            (1, "A", "p", "B"),
            (1, "A", "p", "B"),  # duplicate mention: still one fact
            (1, "A", "q", "C"),
            (2, "D", "p", "E"),
        ],
    )
    new = _df(
        spark,
        [
            (1, "A", "p", "B"),  # survives (old dup collapses)
            (1, "A", "q", "X"),  # changed object: remove+add pair
            (3, "N", "p", "M"),  # new url
        ],
    )
    got = {
        (r.doc_id, r.subj, r.pred, r.obj, r.change)
        for r in triple_delta(old, new).collect()
    }
    assert got == {
        (1, "A", "q", "C", "removed"),
        (2, "D", "p", "E", "removed"),
        (1, "A", "q", "X", "added"),
        (3, "N", "p", "M", "added"),
    }


def test_delta_identical_inputs_is_empty(spark):
    rows = [(1, "A", "p", "B"), (2, "C", "q", "D")]
    assert triple_delta(_df(spark, rows), _df(spark, rows)).count() == 0


def test_delta_single_shuffle_plan(spark):
    """No join in the plan: union + one hash aggregate + filter."""
    old = _df(spark, [(1, "A", "p", "B")])
    new = _df(spark, [(1, "A", "p", "C")])
    plan = triple_delta(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # one per final agg side after AQE
