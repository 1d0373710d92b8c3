"""Resumable MERGE sink: idempotence + exact resume (north_rule)."""

import glob
import shutil
import tempfile

import pytest

from rdf_to_text_spark import fixtures
from rdf_to_text_spark.sinks.merge import BucketedParquetMerge, run_resumable


@pytest.fixture()
def base_dir():
    d = tempfile.mkdtemp(prefix="kgsink_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_full_run_then_resume_is_idempotent(spark, base_dir):
    pages = fixtures.pages_from_documents(spark, "/root/testdata/sf0.001")
    res = run_resumable(spark, pages, base_dir, n_chunks=4)
    assert sorted(r["chunk_id"] for r in res) == [0, 1, 2, 3]
    sink = BucketedParquetMerge(spark, base_dir)
    edges_before = {
        (r.subj, r.pred, r.obj) for r in sink.edges().select("subj", "pred", "obj").collect()
    }

    # simulate a crash that lost the last two chunk commits
    for p in glob.glob(f"{base_dir}/lineage/chunk=2") + glob.glob(f"{base_dir}/lineage/chunk=3"):
        shutil.rmtree(p)
    res2 = run_resumable(spark, pages, base_dir, n_chunks=4)
    assert sorted(r["chunk_id"] for r in res2) == [2, 3]

    edges_after = {
        (r.subj, r.pred, r.obj) for r in sink.edges().select("subj", "pred", "obj").collect()
    }
    assert edges_before == edges_after  # exact resume, no dupes

    # a fully-committed job is a no-op on re-run
    assert run_resumable(spark, pages, base_dir, n_chunks=4) == []


def test_lineage_metrics_rows(spark, base_dir):
    pages = fixtures.pages_from_documents(spark, "/root/testdata/sf0.001")
    run_resumable(spark, pages, base_dir, n_chunks=2)
    sink = BucketedParquetMerge(spark, base_dir)
    rows = sink.lineage().collect()
    assert len(rows) == 2
    assert all(r.n_pages > 0 and r.n_triples > 0 and r.wall_sec > 0 for r in rows)
    # entity table derives from edges with stable ids
    ents = sink.entities()
    assert ents.count() == ents.select("entity_id").distinct().count()
