

def test_crawl_frontier_min_depth_and_early_stop(spark):
    from rdf_to_text_spark.operators.webtext import crawl_frontier

    #   0 -> 1 -> 2 -> 3 -> 4   (chain), plus 1 -> 0 back edge (cycle)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (1, 0)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    got = {(r.doc_id, r.depth) for r in crawl_frontier(edges, seeds, 3).collect()}
    assert got == {(0, 0), (1, 1), (2, 2), (3, 3)}  # 4 is beyond depth 3

    # isolated seed: frontier exhausts at round 1, loop short-circuits
    lonely = spark.createDataFrame([(99,)], "doc_id long")
    got2 = {(r.doc_id, r.depth) for r in crawl_frontier(edges, lonely, 3).collect()}
    assert got2 == {(99, 0)}


def test_hits_int_rejects_nonpositive_iters(spark):
    import pytest as _pytest

    from rdf_to_text_spark.operators.webtext import hits_int

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
    with _pytest.raises(ValueError, match="iters"):
        hits_int(edges, nodes, iters=0)


def test_sitemap_gap_is_session_timezone_invariant(spark, tmp_path):
    # lastmod is parsed with an explicit UTC offset (pattern XXX): the
    # stale/fresh split must not move with spark.sql.session.timeZone.
    from rdf_to_text_spark.queries_catalog import QUERIES, EXTRA_QUERIES

    q = (EXTRA_QUERIES | QUERIES)["web_sitemap_gap"]
    sf = "/root/testdata/sf0.001"
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        east = sorted(map(tuple, q(spark, sf).collect()))
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = sorted(map(tuple, q(spark, sf).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert east == utc and len(utc) > 0


def test_resolve_redirect_chains_terminals_and_hops(spark):
    from rdf_to_text_spark.operators.webtext import resolve_redirect_chains

    # a->b->c->d (terminal d); x->c merges into the chain; lone->d
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "c"), ("lone", "d")],
        "src string, dst string",
    )
    got = {r.src: (r.final, r.n_hops) for r in resolve_redirect_chains(edges).collect()}
    assert got == {
        "a": ("d", 3),
        "b": ("d", 2),
        "c": ("d", 1),
        "x": ("d", 2),
        "lone": ("d", 1),
    }


def test_resolve_redirect_chains_cycle_raises(spark):
    import pytest as _pytest

    from rdf_to_text_spark.operators.webtext import resolve_redirect_chains

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "a")], "src string, dst string"
    )
    with _pytest.raises(ValueError, match="cycle") as exc:
        resolve_redirect_chains(edges, max_iters=4)
    # the error names a sample of the still-moving srcs (here the cycle
    # members and the chain feeding into it)
    assert "sample unresolved srcs" in str(exc.value)
    assert any(s in str(exc.value) for s in ("'a'", "'b'", "'c'"))


def test_allocate_crawl_budget_hamilton(spark):
    from rdf_to_text_spark.operators.webtext import allocate_crawl_budget

    # weights 5, 3, 2 over budget 10 -> exact proportions, no leftover
    hosts = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2)], "host string, n_pages long"
    )
    got = {r.host: r.quota for r in allocate_crawl_budget(hosts, 10).collect()}
    assert got == {"a": 5, "b": 3, "c": 2}

    # budget 10 over weights 1,1,1: base 3 each, leftover 1 goes to the
    # largest-remainder tie broken by md5(host): all rems equal -> md5
    # order decides; sum must still be exactly the budget
    hosts3 = spark.createDataFrame(
        [("x", 1), ("y", 1), ("z", 1)], "host string, n_pages long"
    )
    import hashlib

    got3 = {r.host: r.quota for r in allocate_crawl_budget(hosts3, 10).collect()}
    assert sum(got3.values()) == 10 and sorted(got3.values()) == [3, 3, 4]
    winner = min("xyz", key=lambda h: hashlib.md5(h.encode()).hexdigest())
    assert got3[winner] == 4

    # degenerate inputs raise loudly
    import pytest as _pytest

    empty = spark.createDataFrame([], "host string, n_pages long")
    with _pytest.raises(ValueError, match="total weight"):
        allocate_crawl_budget(empty, 10)
    with _pytest.raises(ValueError, match="budget"):
        allocate_crawl_budget(hosts, -1)
    # budget is interpolated into F.expr arithmetic: only true ints pass
    with _pytest.raises(TypeError, match="int"):
        allocate_crawl_budget(hosts, 10.0)
    with _pytest.raises(TypeError, match="int"):
        allocate_crawl_budget(hosts, True)
