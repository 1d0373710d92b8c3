"""Salted join / salted collect equivalence + skew profile."""

from pyspark.sql import functions as F

from rdf_to_text_spark.operators.skew import key_skew_profile, salted_collect, salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed probe: 80% of rows share one key (the Zipf head shape)
    probe = spark.createDataFrame(
        [(("hot" if i % 5 != 0 else f"k{i}"), i) for i in range(500)], "key string, v long"
    )
    build = spark.createDataFrame(
        [("hot", "H"), ("k5", "A"), ("k10", "B"), ("missing", "X")], "key string, attr string"
    )
    plain = {(r.key, r.v, r.attr) for r in probe.join(build, "key").collect()}
    salted = {(r.key, r.v, r.attr) for r in salted_join(probe, build, "key").collect()}
    assert salted == plain
    assert len(plain) > 400  # the hot key actually joined


def test_salted_join_left(spark):
    probe = spark.createDataFrame([("a", 1), ("b", 2)], "key string, v long")
    build = spark.createDataFrame([("a", "X")], "key string, attr string")
    rows = {(r.key, r.attr) for r in salted_join(probe, build, "key", how="left").collect()}
    assert rows == {("a", "X"), ("b", None)}


def test_salted_collect_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", f"v{i:03d}") for i in range(200)] + [("cold", "x")], "key string, val string"
    )
    got = {r.key: list(r.vals) for r in salted_collect(df, "key", "val").collect()}
    plain = {
        r.key: sorted(r.vals)
        for r in df.groupBy("key").agg(F.collect_list("val").alias("vals")).collect()
    }
    assert got == plain


def test_key_skew_profile(spark):
    df = spark.createDataFrame(
        [("hot",)] * 90 + [("cold",)] * 10, "key string"
    )
    prof = {r.key: (r.n, r.share) for r in key_skew_profile(df, "key").collect()}
    assert prof["hot"] == (90, 0.9)
    assert prof["cold"] == (10, 0.1)
