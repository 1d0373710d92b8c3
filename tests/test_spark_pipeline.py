"""End-to-end Spark pipeline vs DuckDB oracle (the driver's own check)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "sent_idx", "subj", "pred", "obj"]


def test_every_query_matches_oracle(spark, oracle_con):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(queries)
    for name, fn in queries.items():
        got = fn(spark, SF).toPandas()
        sql = oracles.get(name)
        if sql is None:
            assert len(got) >= 0  # rows-only contract
            continue
        exp = oracle_con.sql(sql).df()
        cols = sorted(got.columns)
        assert sorted(exp.columns) == cols, f"{name}: column mismatch"
        a = got[cols].astype(str).sort_values(cols).reset_index(drop=True)
        b = exp[cols].astype(str).sort_values(cols).reset_index(drop=True)
        assert a.equals(b), f"{name}: value mismatch ({len(a)} vs {len(b)} rows)"


def test_precision_recall_gate(spark):
    """north_rule: P ≥ 0.95 AND R ≥ 0.95 vs reference-semantics triples."""
    from rdf_to_text_spark.fixtures import gold_triples_py

    df = entry_mod.entry(spark)
    got = {(r.doc_id, r.sent_idx, r.subj, r.pred, r.obj) for r in df.collect()}
    import duckdb as _d

    ids = _d.sql(f"SELECT doc_id FROM '{SF}/documents.parquet'").df()["doc_id"].tolist()
    gold = set(gold_triples_py([int(i) for i in ids]))
    tp = len(got & gold)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(gold) if gold else 0.0
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
