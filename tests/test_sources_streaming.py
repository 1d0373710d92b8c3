"""Sources (XML corpus, aligned lines) and streaming extraction."""

import os
import shutil
import tempfile
import textwrap

import pytest
from pyspark.sql import functions as F

from rdf_to_text_spark.sources.readers import (
    entry_stats,
    read_aligned_lines,
    read_benchmark_xml,
    select_files_glob,
)

XML = textwrap.dedent(
    """\
    <benchmark><entries>
      <entry category="Airport" eid="Id1" size="1">
        <originaltripleset><otriple>A | origPred | B</otriple></originaltripleset>
        <modifiedtripleset><mtriple>A | pred | B</mtriple></modifiedtripleset>
        <lex comment="good" lid="Id1">A has pred B .</lex>
        <lex comment="good" lid="Id2">B is pred of A .</lex>
      </entry>
      <entry category="Airport" eid="Id2" size="1">
        <modifiedtripleset><mtriple>C | pred | D</mtriple></modifiedtripleset>
      </entry>
      <entry category="City" eid="Id3" size="2">
        <originaltripleset><otriple>E | o1 | F</otriple><otriple>F | o2 | G</otriple></originaltripleset>
        <modifiedtripleset><mtriple>E | p1 | F</mtriple><mtriple>F | p2 | G</mtriple></modifiedtripleset>
        <lex comment="" lid="Id1">E p1 F p2 G .</lex>
      </entry>
    </entries></benchmark>
    """
)


@pytest.fixture()
def xml_dir():
    d = tempfile.mkdtemp(prefix="webnlg_xml_")
    os.makedirs(f"{d}/1triples", exist_ok=True)
    with open(f"{d}/1triples/sample_Airport.xml", "w") as f:
        f.write(XML)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_read_benchmark_xml_skips_lexless(spark, xml_dir):
    """Entries with no <lex> are skipped — benchmark_reader.py:73-80."""
    df = read_benchmark_xml(spark, f"{xml_dir}/1triples/*.xml")
    rows = {r.eid: r for r in df.collect()}
    assert set(rows) == {"Id1", "Id3"}  # Id2 has no lex
    assert rows["Id1"].category == "Airport" and rows["Id1"].size == "1"
    assert [t.p for t in rows["Id1"].mtriples] == ["pred"]
    assert len(rows["Id1"].lexs) == 2


def test_entry_stats(spark, xml_dir):
    df = read_benchmark_xml(spark, f"{xml_dir}/1triples/*.xml")
    stats = entry_stats(df)
    assert stats["unique_p"].collect()[0].unique_p == 3  # pred, p1, p2
    assert stats["total_lexcount"].collect()[0].total_lexcount == 3
    pm = {r.mpred: set(r.opreds) for r in stats["property_map"].collect()}
    assert pm["pred"] == {"origPred"} and pm["p1"] == {"o1"}
    cube = {(r.size, r.category): r.n for r in stats["entry_cube"].collect()}
    assert cube[(None, None)] == 2  # grand total (lexless entry dropped)
    assert cube[("1", "Airport")] == 1


def test_select_files_glob():
    assert select_files_glob("/d", sizes=(1, 3)) == "/d/{1,2}triples/*.xml"
    assert select_files_glob("/d", category="Airport", sizes=0) == "/d/*Airport*.xml"


def test_read_aligned_lines(spark):
    d = tempfile.mkdtemp(prefix="lines_")
    with open(f"{d}/a.triple", "w") as f:
        f.write("t1\nt2\nt3")
    with open(f"{d}/a.lex", "w") as f:
        f.write("l1\nl2\nl3")
    df = read_aligned_lines(spark, f"{d}/a.triple", f"{d}/a.lex")
    rows = sorted((r.line_id, r.triple, r.lex) for r in df.collect())
    assert rows == [(1, "t1", "l1"), (2, "t2", "l2"), (3, "t3", "l3")]
    shutil.rmtree(d, ignore_errors=True)


def test_stream_extract_matches_batch(spark):
    """Streaming and batch paths share operators → identical triples."""
    from rdf_to_text_spark import fixtures
    from rdf_to_text_spark.pipeline import extract_pipeline
    from rdf_to_text_spark.streaming.extract_stream import stream_extract

    work = tempfile.mkdtemp(prefix="stream_")
    pages_dir, out_dir, ckpt = f"{work}/pages", f"{work}/out", f"{work}/ckpt"
    pages = fixtures.pages_from_range(spark, 300, partitions=3)
    pages.write.parquet(pages_dir)

    q = stream_extract(spark, pages_dir, out_dir, ckpt, trigger_once=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).select("doc_id", "sent_idx", "subj", "pred", "obj")
    batch = extract_pipeline(spark.read.parquet(pages_dir), use_html=True).select(
        "doc_id", "sent_idx", "subj", "pred", "obj"
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in batch.collect()}
    shutil.rmtree(work, ignore_errors=True)


def test_crawl_rate_watermark(spark):
    from rdf_to_text_spark import fixtures
    from rdf_to_text_spark.streaming.extract_stream import crawl_rate

    pages = fixtures.pages_from_range(spark, 100, partitions=2)
    agg = crawl_rate(pages)  # batch path of the same query
    total = agg.agg(F.sum("n_pages")).collect()[0][0]
    assert total == 100
