"""Graph operators vs reference semantics (SURVEY.md G1-G7 goldens)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rdf_to_text_spark.operators.graph import (
    bfs_path_py,
    levi_edges,
    serialize_paths,
    sources_and_sinks,
)


def _triples_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, sent_idx int, subj string, pred string, obj string"
    )


def test_levi_edges_basic(spark):
    """A0: subj_head → pred ; A1: obj_head → pred (build_dataset.py:41-51)."""
    df = _triples_df(spark, [(1, 0, "Aarhus_Airport", "cityServed", "Aarhus")])
    got = {tuple(r) for r in levi_edges(df).select("node1", "node2", "label").collect()}
    assert got == {("aarhus", "cityserved", "A0"), ("aarhus", "cityserved", "A1")}


def test_levi_edges_ne(spark):
    """NE edges: every tail token → head token (build_dataset.py:53-61)."""
    df = _triples_df(spark, [(1, 0, "Kill_Rock_Stars", "recordLabel", "Abra_Moore")])
    got = {
        tuple(r)
        for r in levi_edges(df, with_ne=True)
        .select("node1", "node2", "label")
        .collect()
    }
    assert ("rock", "kill", "NE") in got
    assert ("stars", "kill", "NE") in got
    assert ("moore", "abra", "NE") in got
    assert ("kill", "recordlabel", "A0") in got


# ---------------------------------------------------------------- G6 / G7
def test_sources_and_sinks_dag(spark):
    edges = spark.createDataFrame(
        [(1, "a", "b"), (1, "b", "c")], "doc_id long, src string, dst string"
    )
    got = {r.node: (r.is_source, r.is_sink, r.is_cyclic) for r in sources_and_sinks(edges).collect()}
    assert got["a"] == (True, False, False)
    assert got["c"] == (False, True, False)
    assert got["b"] == (False, False, False)


def test_sources_and_sinks_cycle(spark):
    edges = spark.createDataFrame(
        [(1, "a", "b"), (1, "b", "a")], "doc_id long, src string, dst string"
    )
    rows = sources_and_sinks(edges).collect()
    assert all(r.is_cyclic for r in rows)


def test_bfs_path_chain():
    """a -p-> b -q-> c: one path, serialized 'a p b q c', jump=5."""
    res = bfs_path_py([("a", "p", "b"), ("b", "q", "c")])
    assert res is not None
    seq, jumps = res
    assert seq == ["a", "p", "b", "q", "c"]
    assert jumps == [5]


def test_bfs_path_diamond():
    """Diamond a→b→d, a→c→d: two source→sink paths from one source."""
    res = bfs_path_py([("a", "p", "b"), ("a", "q", "c"), ("b", "r", "d"), ("c", "s", "d")])
    assert res is not None
    seq, jumps = res
    # BFS shortest path to d goes through b (first-discovered); both
    # 3-node paths share length; nx keeps the first predecessor.
    assert seq[0] == "a"
    assert len(jumps) == 1  # only d is a sink; b/c have out-degree > 0
    assert seq == ["a", "p", "b", "r", "d"]


def test_bfs_multi_source():
    """Two sources pointing at one sink — both paths serialize, offsets accumulate."""
    res = bfs_path_py([("a", "p", "c"), ("b", "q", "c")])
    seq, jumps = res
    assert seq == ["a", "p", "c", "b", "q", "c"]
    assert jumps == [3, 6]


def test_bfs_cyclic_dropped():
    """Pure cycle → no sources/sinks → dropped (build_dataset.py:269-272)."""
    assert bfs_path_py([("a", "p", "b"), ("b", "q", "a")]) is None


def test_serialize_paths_spark(spark):
    df = _triples_df(
        spark,
        [
            (1, 0, "a", "p", "b"),
            (1, 1, "b", "q", "c"),
            (2, 0, "x", "p", "y"),
            (2, 1, "y", "q", "x"),  # cyclic example
        ],
    )
    rows = {r.example_id: r for r in serialize_paths(df, "doc_id").collect()}
    assert rows[1].gtr_seq == "a p b q c"
    assert list(rows[1].gtr_jumps) == [5]
    assert rows[1].dropped_cyclic == 0
    assert rows[2].dropped_cyclic == 1 and rows[2].gtr_seq is None


def test_gcn_arrays_reference_semantics(spark):
    """buildGraph (webnlg_gcnonmt_input.py:49-86) hand-checked:
    networkx MultiDiGraph adjacency iteration reorders edges (A's edges
    first), rel nodes append per-edge even when duplicated, ents index
    by first NAME occurrence."""
    from rdf_to_text_spark.operators.graph import gcn_arrays

    df = _triples_df(
        spark,
        [
            (1, 0, "A", "x", "B"),
            (1, 1, "C", "y", "D"),
            (1, 2, "A", "z", "E"),   # adjacency order pulls this before (C,D)
            (2, 0, "A", "x", "B"),
            (2, 1, "B", "x", "C"),   # duplicate rel name -> fresh node
        ],
    )
    rows = {r.example_id: r for r in gcn_arrays(df, "doc_id").collect()}
    assert rows[1].nodes == "A x B z E C y D"
    assert rows[1].labels == "A0 A1 A0 A1 A0 A1"
    assert rows[1].node1 == "0 2 0 4 5 7"
    assert rows[1].node2 == "1 1 3 3 6 6"
    assert rows[2].nodes == "A x B x C"
    assert rows[2].labels == "A0 A1 A0 A1"
    assert rows[2].node1 == "0 2 2 4"
    assert rows[2].node2 == "1 1 3 3"


def test_gcn_arrays_ent_rel_name_collision(spark):
    """A subject named like a relation indexes at the FIRST occurrence
    of the NAME (list.index semantics, :66-72)."""
    from rdf_to_text_spark.operators.graph import gcn_arrays

    df = _triples_df(spark, [(1, 0, "x", "x", "B")])
    row = gcn_arrays(df, "doc_id").collect()[0]
    assert row.nodes == "x x B"
    assert row.node1 == "0 2"   # subj indexes the first 'x'
    assert row.node2 == "1 1"
