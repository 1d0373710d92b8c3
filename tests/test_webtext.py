

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
