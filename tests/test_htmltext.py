"""Production HTML→text extractor (functions/htmltext.py) + rich fixture.

Three layers:
  * semantics unit tests — each rule of the extraction spec on minimal
    documents (skip subtrees, entities, inline vs block, malformed);
  * round-trip — extractor output == the renderer's expected text for a
    doc_id sweep (the executable spec of fixtures_web);
  * Spark — the Arrow-batched UDF equals the plain-Python extractor.

The DuckDB oracle side (rich_text_sql) is swept with the driver's own
compare in tests/test_extra_queries.py via the `html_extract_rich`
catalog entry; test_oracle_matches_renderer here pins it standalone so
a fixture edit can't silently drift the two sides apart.
"""

import duckdb

from rdf_to_text_spark import fixtures_web
from rdf_to_text_spark.fixtures import gold_triples_py, render_page_py
from rdf_to_text_spark.functions.htmltext import (
    extract_blocks_py,
    extract_links_py,
    extract_rich_udf,
    extract_text_rich_py,
)
from rdf_to_text_spark.operators.webtext import (
    extract_triples_from_rich_html,
    html_blocks,
    html_links,
    link_degrees,
)


def t(html: str) -> str:
    return extract_text_rich_py(html)


# ------------------------------------------------------------- semantics
def test_entities_decoded():
    assert t("<p>fish &amp; chips &#169; now</p>") == "fish & chips © now"


def test_script_style_dropped_nested_safe():
    html = "<div>a<script>var x = '<p>not text</p>';</script>b</div>"
    assert t(html) == "ab"
    assert t("<style>p { color: red }</style><p>ok</p>") == "ok"


def test_noscript_template_svg_dropped():
    assert t("<noscript>x</noscript><p>y</p>") == "y"
    assert t("<template><p>x</p></template><p>y</p>") == "y"
    assert t("<svg><text>x</text></svg><p>y</p>") == "y"


def test_template_block_tags_do_not_break_lines():
    # template content is inert: no line break leaks out of the subtree
    assert t("<p>foo<template><p>x</p></template>bar</p>") == "foobar"


def test_comments_and_doctype_dropped():
    assert t("<!DOCTYPE html><!-- no -->\n<p>yes</p>") == "yes"


def test_inline_preserves_adjacency_block_breaks():
    assert t("<p>fo<b>o</b> bar</p>") == "foo bar"
    assert t("<p>one</p><p>two</p>") == "one\ntwo"
    assert t("<ul><li>a</li><li>b</li></ul>") == "a\nb"


def test_br_breaks_whitespace_collapses():
    assert t("<p>a<br>b</p>") == "a\nb"
    assert t("<p>  a \t b\n c  </p>") == "a b c"


def test_malformed_never_raises():
    cases = [
        "<p>unclosed <b>bold",
        "text with a stray < sign",
        "&nosuchentity; stays",
        "<script>never closed",
        "</script></div></p>lonely closers<p>tail",
        "",
    ]
    for html in cases:
        t(html)  # must not raise
    assert t("<p>unclosed <b>bold") == "unclosed bold"
    # a stray </script> must not swallow following text
    assert t("</script><p>after</p>") == "after"


def test_none_and_bytes_inputs():
    assert extract_text_rich_py(None) == ""
    assert extract_text_rich_py("<p>café</p>".encode()) == "café"
    # invalid utf-8 degrades via replacement, never raises
    assert "ok" in extract_text_rich_py(b"<p>ok\xff\xfe</p>")


# ------------------------------------------------------------- round-trip
def test_roundtrip_sweep():
    for d in range(0, 3000, 7):
        page = fixtures_web.render_rich_page_py(d)
        assert extract_text_rich_py(page["html"]) == page["text"], d


def test_expected_line_structure():
    page = fixtures_web.render_rich_page_py(11)
    lines = page["text"].split("\n")
    assert lines[0].startswith("Doc 11 & the ")
    assert lines[1:3] == ["Home", "About"]
    assert lines[3] == "Entry 11"
    assert lines[-1] == "© 2024 Synth <Example>"
    n_sent, n_out = 1 + 11 % 3, 1 + (11 * 7 + 3) % 4
    assert len(lines) == 5 + n_sent + n_out


# ------------------------------------------------------------- oracle
def test_oracle_matches_renderer():
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT range AS doc_id FROM range(0, 400)")
    df = con.sql(fixtures_web.rich_text_sql()).df().set_index("doc_id")
    for d in range(400):
        page = fixtures_web.render_rich_page_py(d)
        assert df.loc[d, "text"] == page["text"], d
        assert int(df.loc[d, "n_lines"]) == page["text"].count("\n") + 1
    con.close()


# ------------------------------------------------------------- blocks
def test_blocks_provenance_tags():
    html = (
        "<title>T</title><nav><ul><li>A</li></ul></nav>"
        "<h1>H <span>1</span></h1><p>body <b>x</b></p><footer>F</footer>"
    )
    assert extract_blocks_py(html) == [
        ("title", "T"),
        ("li", "A"),
        ("h1", "H 1"),
        ("p", "body x"),
        ("footer", "F"),
    ]


def test_blocks_innermost_container_and_toplevel():
    assert extract_blocks_py("<div>outer<p>inner</p></div>") == [
        ("div", "outer"),
        ("p", "inner"),
    ]
    assert extract_blocks_py("bare text") == [(None, "bare text")]


def test_blocks_unclosed_and_mismatched_tags():
    assert extract_blocks_py("<p>one<p>two") == [("p", "one"), ("p", "two")]
    # stray close of a never-opened block tag: still a line break
    # (browser-like implicit paragraph), but the stack is left alone
    assert extract_blocks_py("<div>a</p>b</div>") == [("div", "a"), ("div", "b")]


def test_blocks_join_equals_text():
    for d in (0, 1, 7, 23):
        page = fixtures_web.render_rich_page_py(d)
        blocks = extract_blocks_py(page["html"])
        assert "\n".join(line for _t, line in blocks) == page["text"]


def test_blocks_roundtrip_sweep():
    for d in range(0, 2000, 13):
        page = fixtures_web.render_rich_page_py(d)
        assert extract_blocks_py(page["html"]) == page["blocks"], d


def test_p_blocks_reassemble_flagship_text():
    """Main-content selection invariant: the <p> lines of the rich page
    joined by spaces ARE fixtures.render_page_py's text — the bridge
    that lets the rich path reuse the flagship gold-triples oracle."""
    for d in range(0, 500, 11):
        page = fixtures_web.render_rich_page_py(d)
        ptext = " ".join(l for t, l in extract_blocks_py(page["html"]) if t == "p")
        assert ptext == render_page_py(d)["text"], d


def test_blocks_oracle_matches_renderer():
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT range AS doc_id FROM range(0, 200)")
    df = (
        con.sql(fixtures_web.rich_blocks_sql())
        .df()
        .sort_values(["doc_id", "block_idx"])
    )
    got = list(zip(df.doc_id.astype(int), df.block_idx.astype(int), df.tag, df.text))
    exp = [
        (d, i, t, l)
        for d in range(200)
        for i, (t, l) in enumerate(fixtures_web.render_rich_page_py(d)["blocks"])
    ]
    assert got == exp
    con.close()


# ------------------------------------------------------------- meta
def test_meta_extraction():
    from rdf_to_text_spark.functions.htmltext import extract_meta_py

    html = (
        '<head><meta charset="utf-8">'
        '<meta name="robots" content="noindex, nofollow">'
        '<meta name="description" content="a &amp; b">'
        '<meta content="orphan"><meta name="orphan2"></head>'
    )
    assert extract_meta_py(html) == [
        ("robots", "noindex, nofollow"),
        ("description", "a & b"),
    ]
    # XHTML self-closing form and skip-subtree gating
    assert extract_meta_py('<meta name="x" content="y" />') == [("x", "y")]
    assert extract_meta_py('<template><meta name="x" content="y"></template>') == []


def test_meta_roundtrip_sweep():
    from rdf_to_text_spark.functions.htmltext import extract_meta_py

    for d in range(0, 1000, 13):
        page = fixtures_web.render_rich_page_py(d)
        assert extract_meta_py(page["html"]) == page["metas"], d
        assert ("robots", "noindex") in page["metas"]  # every 13th doc


# ------------------------------------------------------------- links
def test_links_basic_and_entities():
    html = '<a href="/x?a=1&amp;b=2">first <b>link</b></a><a href="/y">two</a>'
    assert extract_links_py(html) == [
        ("/x?a=1&b=2", "first link"),
        ("/y", "two"),
    ]


def test_links_edge_cases():
    # no href -> no link; anchor inside skipped subtree ignored
    assert extract_links_py("<a>nameless</a>") == []
    assert extract_links_py("<template><a href='/t'>x</a></template>") == []
    # dangling anchor still yields its href + accumulated text
    assert extract_links_py('<a href="/d">dangling') == [("/d", "dangling")]
    # a new <a> implicitly closes the previous one
    assert extract_links_py('<a href="/1">one<a href="/2">two</a>') == [
        ("/1", "one"),
        ("/2", "two"),
    ]
    # link text still appears in the extracted text
    assert extract_text_rich_py('<p>go <a href="/z">here</a> now</p>') == "go here now"


def test_links_roundtrip_sweep():
    for d in range(0, 2000, 17):
        page = fixtures_web.render_rich_page_py(d)
        assert extract_links_py(page["html"]) == page["links"], d


def test_links_oracle_matches_renderer():
    from urllib.parse import urljoin

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT range AS doc_id FROM range(0, 200)")
    df = (
        con.sql(fixtures_web.web_links_sql())
        .df()
        .sort_values(["doc_id", "link_idx"])
    )
    got = list(
        zip(df.doc_id.astype(int), df.link_idx.astype(int), df.href, df.resolved, df.anchor)
    )
    exp = []
    for d in range(200):
        page = fixtures_web.render_rich_page_py(d)
        for i, (href, anchor) in enumerate(page["links"]):
            exp.append((d, i, href, urljoin(page["url"], href), anchor))
    assert got == exp
    con.close()


# ------------------------------------------------------------- spark
def test_html_links_operator_and_degrees(spark):
    from urllib.parse import urljoin

    n = 60
    pages = fixtures_web.rich_pages_from_range(spark, n, partitions=4)
    df = html_links(pages).toPandas().sort_values(["doc_id", "link_idx"])
    got = list(
        zip(df.doc_id.astype(int), df.link_idx.astype(int), df.href, df.resolved, df.anchor)
    )
    exp = []
    outd = {d: 0 for d in range(n)}
    ind = {d: 0 for d in range(n)}
    for d in range(n):
        page = fixtures_web.render_rich_page_py(d)
        for i, (href, anchor) in enumerate(page["links"]):
            exp.append((d, i, href, urljoin(page["url"], href), anchor))
        for k in range(1 + (d * 7 + 3) % 4):
            j = (d * 37 + k * 61 + 1) % 4096
            if j < n:
                outd[d] += 1
                ind[j] += 1
    assert got == exp

    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    cleanup: list = []
    deg = link_degrees(pages, docs, cleanup=cleanup).toPandas().set_index("doc_id")
    for h in cleanup:
        h.unpersist()
    assert len(deg) == n
    for d in range(n):
        assert int(deg.loc[d, "out_links"]) == outd[d], d
        assert int(deg.loc[d, "in_links"]) == ind[d], d


def test_pagerank_int_matches_reference(spark):
    """Integer PageRank == the plain-Python floor-division spec."""
    from collections import defaultdict

    from rdf_to_text_spark.operators.webtext import link_edges, pagerank_int

    n, total = 80, 10**12
    edges_py = []
    for d in range(n):
        for k in range(1 + (d * 7 + 3) % 4):
            j = (d * 37 + k * 61 + 1) % 4096
            if j < n and j != d:
                edges_py.append((d, j))
    deg = defaultdict(int)
    for s, _ in edges_py:
        deg[s] += 1
    rank = {d: total for d in range(n)}
    base = total * 15 // 100
    for _ in range(3):
        recv = defaultdict(int)
        for s, t_ in edges_py:
            recv[t_] += (rank[s] * 85 // 100) // deg[s]
        rank = {d: base + recv[d] for d in range(n)}

    pages = fixtures_web.rich_pages_from_range(spark, n, partitions=4)
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    cleanup: list = []
    edges = link_edges(pages, docs).filter("src <> dst")
    got = (
        pagerank_int(edges, docs, iters=3, total=total, cleanup=cleanup)
        .toPandas()
        .set_index("doc_id")["rank"]
        .to_dict()
    )
    for h in cleanup:
        h.unpersist()
    assert got == rank
    # teleport floor: every node holds at least the base mass
    assert min(got.values()) >= base


def test_html_blocks_operator(spark):
    pages = fixtures_web.rich_pages_from_range(spark, 40, partitions=4)
    df = html_blocks(pages).toPandas().sort_values(["doc_id", "block_idx"])
    got = list(zip(df.doc_id.astype(int), df.block_idx.astype(int), df.tag, df.text))
    exp = [
        (d, i, t, l)
        for d in range(40)
        for i, (t, l) in enumerate(fixtures_web.render_rich_page_py(d)["blocks"])
    ]
    assert got == exp


def test_rich_html_triples_match_gold(spark):
    """Realistic pages end-to-end: html → blocks → <p> content →
    normalize → template extraction == the arithmetic gold triples."""
    n = 120
    pages = fixtures_web.rich_pages_from_range(spark, n, partitions=4)
    out = extract_triples_from_rich_html(pages).toPandas()
    got = sorted(
        zip(out.doc_id.astype(int), out.sent_idx.astype(int), out.subj, out.pred, out.obj)
    )
    exp = sorted((g[0], g[1], g[2], g[3], g[4]) for g in gold_triples_py(list(range(n))))
    assert got == exp


def test_udf_equals_python(spark):
    pages = fixtures_web.rich_pages_from_range(spark, 64, partitions=4)
    got = (
        pages.select("doc_id", extract_rich_udf("html").alias("text"))
        .toPandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    assert len(got) == 64
    for d in range(64):
        assert got[d] == fixtures_web.render_rich_page_py(d)["text"], d


def test_parse_pages_nested_views(spark):
    """Parse-once frame: the nested blocks/links/metas columns carry
    the SAME content as the per-view extractors and the fixture spec."""
    from urllib.parse import urljoin

    from rdf_to_text_spark.operators.webtext import parse_pages

    n = 30
    pages = fixtures_web.rich_pages_from_range(spark, n, partitions=3)
    rows = {r.doc_id: r for r in parse_pages(pages).collect()}
    assert len(rows) == n
    for d in range(n):
        page = fixtures_web.render_rich_page_py(d)
        r = rows[d]
        assert r.text == page["text"]
        assert [(b.tag, b.text) for b in r.blocks] == page["blocks"]
        assert [(x.href, x.resolved, x.anchor) for x in r.links] == [
            (h, urljoin(page["url"], h), a) for h, a in page["links"]
        ]
        assert [(m.name, m.content) for m in r.metas] == page["metas"]


def test_latest_snapshot_same_ts_tiebreak(spark):
    """Same-second captures: the kept row is the DETERMINISTIC payload-
    hash winner (xxhash64 of the tiebreak column, descending), never
    shuffle arrival order."""
    from pyspark.sql import functions as F

    from rdf_to_text_spark.operators.webtext import latest_snapshot

    rows = [
        ("https://synth.example/a", "2024-01-01 00:00:00", b"capture-one"),
        ("https://synth.example/a", "2024-01-01 00:00:00", b"capture-two"),
        ("https://synth.example/b", "2024-01-01 00:00:00", b"only"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    # expected winner for url a: the payload whose xxhash64 is larger
    hashes = {
        bytes(r.html): r.h
        for r in pages.select("html", F.xxhash64("html").alias("h")).collect()
        if bytes(r.html) != b"only"
    }
    expect_a = max(hashes, key=hashes.get)
    for _ in range(3):  # repeat: stable across shuffles
        kept = {
            r.url: bytes(r.html)
            for r in latest_snapshot(pages.repartition(4)).collect()
        }
        assert kept["https://synth.example/a"] == expect_a
        assert kept["https://synth.example/b"] == b"only"
    # opting out still keeps exactly one row per url
    n = latest_snapshot(pages, tiebreak_col=None).count()
    assert n == 2
