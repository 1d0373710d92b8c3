"""W1/W3/W4, P9/P10, K3/K4 parity operators."""

import json
import os
import shutil
import tempfile

from rdf_to_text_spark.operators.misc import (
    edge_labels,
    reorder_pred_first,
    reverse_triples,
    seeded_pseudo_shuffle,
    sort_within_partitions_by_length,
    token_position,
    write_multi_ref_files,
    write_vocab_json,
)


def test_sort_within_partitions_no_shuffle(spark):
    df = spark.createDataFrame(
        [("a b c",), ("a",), ("a b",)], "text string"
    ).coalesce(1)
    out = [r.text for r in sort_within_partitions_by_length(df, "text").collect()]
    assert out == ["a b c", "a b", "a"]
    # partition-local sort: no Exchange in the plan
    from rdf_to_text_spark.plans.audit import formatted_plan

    assert "Exchange" not in formatted_plan(sort_within_partitions_by_length(df, "text"))


def test_seeded_pseudo_shuffle_deterministic(spark):
    df = spark.createDataFrame([(i, f"r{i}") for i in range(20)], "id long, s string")
    a = [r.id for r in seeded_pseudo_shuffle(df).collect()]
    b = [r.id for r in seeded_pseudo_shuffle(df).collect()]
    assert a == b  # stable permutation
    assert a != sorted(a)  # actually shuffled
    c = [r.id for r in seeded_pseudo_shuffle(df, salt=11).collect()]
    assert a != c  # salt changes the permutation


def test_reverse_triples(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "triples array<int>")
    assert reverse_triples(df).collect()[0].triples == [3, 2, 1]


def test_reorder_pred_first(spark):
    df = spark.createDataFrame([("s", "p", "o")], "subj string, pred string, obj string")
    assert reorder_pred_first(df).columns == ["pred", "subj", "obj"]


def test_token_position_reference_semantics(spark):
    """0-based index, -1 when absent (webnlg_re_input.py:191-196)."""
    df = spark.createDataFrame(
        [("a b c", "b"), ("a b c", "z"), ("x", "x")], "lex string, word string"
    )
    got = {(r.lex, r.word): r.token_pos for r in token_position(df, "lex", "word").collect()}
    assert got[("a b c", "b")] == 1
    assert got[("a b c", "z")] == -1
    assert got[("x", "x")] == 0


def test_edge_labels_multi_edge(spark):
    df = spark.createDataFrame(
        [("a", "b", "A1"), ("a", "b", "A0"), ("a", "c", "NE")],
        "src string, dst string, label string",
    )
    got = {(r.src, r.dst): list(r.labels) for r in edge_labels(df).collect()}
    assert got[("a", "b")] == ["A0", "A1"]  # sorted (W2)
    assert got[("a", "c")] == ["NE"]


def test_multi_ref_files_layout(spark):
    d = tempfile.mkdtemp(prefix="refs_")
    refs = spark.createDataFrame(
        [("s1", "r1a"), ("s1", "r1b"), ("s2", "r2a")], "src string, trg string"
    )
    write_multi_ref_files(refs, d)
    out = spark.read.parquet(d)
    rows = {(r.src, r.ref_idx): r.ref for r in out.collect()}
    assert rows[("s1", 0)] == "r1a" and rows[("s1", 1)] == "r1b"
    assert rows[("s2", 0)] == "r2a" and ("s2", 1) not in rows
    shutil.rmtree(d, ignore_errors=True)


def test_vocab_json_sink(spark):
    from rdf_to_text_spark.operators.vocab import build_vocab

    df = spark.createDataFrame([("a a b",)], "text string")
    d = tempfile.mkdtemp(prefix="vocab_")
    w2i, i2w = f"{d}/word2id.json", f"{d}/id2word.json"
    write_vocab_json(build_vocab(df), w2i, i2w)
    word2id = json.load(open(w2i))
    id2word = json.load(open(i2w))
    assert word2id["<pad>"] == 0 and word2id["a"] == 7 and word2id["b"] == 8
    assert id2word[word2id["a"]] == "a"
    shutil.rmtree(d, ignore_errors=True)
