"""Kernel + fixture tests for structured-data extraction.

The oracle sweep (test_extra_queries.py) pins the five driver-style
queries end-to-end; these tests pin the kernel's edge semantics the
fixture pages don't reach.
"""

from rdf_to_text_spark.fixtures_struct import render_struct_page_py
from rdf_to_text_spark.functions.structparse import (
    flatten_jsonld,
    parse_structdata_py,
)


def test_fixture_kernel_parity_sample():
    for d in [0, 1, 2, 3, 17, 34, 51, 60, 10**8 + 7]:
        r = render_struct_page_py(d)
        out = parse_structdata_py(r["html"])
        assert [(r["doc_id"], *t) for t in out["jsonld"]] == r["jsonld"], d
        assert [(r["doc_id"], *t) for t in out["microdata"]] == r["microdata"], d
        assert [(r["doc_id"], *t) for t in out["infobox"]] == r["infobox"], d


def test_malformed_jsonld_block_is_skipped_and_counter_unaffected():
    html = (
        '<script type="application/ld+json">{"bad": </script>'
        '<script type="application/ld+json">{"@id": "A", "p": "v"}</script>'
    )
    assert parse_structdata_py(html)["jsonld"] == [(0, "A", "p", "v")]


def test_plain_script_and_style_never_leak_into_frames():
    html = (
        '<div itemscope itemid="X"><span itemprop="p">a'
        "<script>var x = 1;</script><style>p{}</style> b</span></div>"
    )
    assert parse_structdata_py(html)["microdata"] == [(0, "X", "p", "a b")]


def test_template_and_svg_subtrees_mint_nothing():
    html = (
        '<template><div itemscope itemid="T"><meta itemprop="x" content="v">'
        '</div><table class="infobox"><tr><th>K</th><td>V</td></tr></table></template>'
        '<svg><script type="application/ld+json">{"@id":"S","p":"v"}</script></svg>'
    )
    out = parse_structdata_py(html)
    assert out["microdata"] == [] and out["infobox"] == [] and out["jsonld"] == []


def test_graph_unwrapping_and_anonymous_nodes():
    blocks = ['{"@context": "https://schema.org", "@graph": [{"a": "1"}, {"b": "2"}]}']
    assert flatten_jsonld(blocks) == [
        (1, "_:j1", "a", "1"),
        (2, "_:j2", "b", "2"),
    ]


def test_scalar_stringification_bool_before_int():
    rows = flatten_jsonld(['{"@id": "X", "t": true, "f": false, "n": 7, "x": 1.5}'])
    assert rows == [
        (0, "X", "t", "true"),
        (0, "X", "f", "false"),
        (0, "X", "n", "7"),
        (0, "X", "x", "1.5"),
    ]


def test_null_and_empty_list_values_contribute_nothing():
    assert flatten_jsonld(['{"@id": "X", "a": null, "b": []}']) == []


def test_multi_token_itemprop_emits_one_row_per_token():
    html = '<div itemscope itemid="X"><meta itemprop="a b" content="v"></div>'
    assert parse_structdata_py(html)["microdata"] == [
        (0, "X", "a", "v"),
        (0, "X", "b", "v"),
    ]


def test_attr_value_ladder():
    html = (
        '<div itemscope itemid="X">'
        '<img itemprop="i" src="/pic.png">'
        '<object itemprop="o" data="/obj">x</object>'
        '<data itemprop="d" value="42">forty-two</data>'
        '<time itemprop="t1" datetime="2024-01-01">then</time>'
        '<time itemprop="t2">New Year</time>'
        "</div>"
    )
    assert parse_structdata_py(html)["microdata"] == [
        (0, "X", "i", "/pic.png"),
        (0, "X", "o", "/obj"),
        (0, "X", "d", "42"),
        (0, "X", "t1", "2024-01-01"),
        (0, "X", "t2", "New Year"),
    ]


def test_itemprop_outside_any_itemscope_is_dropped():
    assert parse_structdata_py('<span itemprop="p">orphan</span>')["microdata"] == []


def test_unclosed_document_finalizes_open_frames():
    html = '<div itemscope itemid="X"><span itemprop="p">trailing text'
    assert parse_structdata_py(html)["microdata"] == [(0, "X", "p", "trailing text")]


def test_nested_item_rows_and_charref_decode():
    html = (
        '<div itemscope itemid="A">'
        '<div itemprop="child" itemscope itemtype="T">'
        '<span itemprop="name">x &amp; y</span></div></div>'
    )
    assert parse_structdata_py(html)["microdata"] == [
        (0, "A", "child", "_:m1"),
        (1, "_:m1", "@type", "T"),
        (1, "_:m1", "name", "x & y"),
    ]


def test_infobox_multiple_tables_and_nested_cells():
    html = (
        '<table class="infobox"><tr><th>A</th><td>1</td></tr></table>'
        '<table class="plain"><tr><th>B</th><td>2</td></tr></table>'
        '<table class="x infobox y"><tr><th>C</th><td><b>3</b> three</td></tr></table>'
    )
    assert parse_structdata_py(html)["infobox"] == [
        (0, 0, "A", "1"),
        (1, 0, "C", "3 three"),
    ]


def test_none_and_bytes_inputs():
    assert parse_structdata_py(None) == {"jsonld": [], "microdata": [], "infobox": []}
    out = parse_structdata_py(b'<div itemscope itemid="B"><meta itemprop="k" content="v"></div>')
    assert out["microdata"] == [(0, "B", "k", "v")]


def test_microdata_fact_candidates_pairing(spark):
    from rdf_to_text_spark.operators.structdata import microdata_fact_candidates

    html = (
        '<div itemscope itemid="A">'
        '<meta itemprop="surface" content="a surf">'
        '<span itemprop="p1">v1</span>'
        '<div itemprop="prov" itemscope><span itemprop="sentence">s0</span></div>'
        "</div>"
        # item without a surface row: relation rows are dropped
        '<div itemscope itemid="B"><span itemprop="p2">v2</span></div>'
    )
    pages = spark.createDataFrame([(1, html.encode())], "doc_id long, html binary")
    rows = {
        (r.doc_id, r.item_idx, r.subj_surface, r.pred, r.obj_surface)
        for r in microdata_fact_candidates(pages).collect()
    }
    assert rows == {(1, 0, "a surf", "p1", "v1")}


def _one_page_df(spark):
    r = render_struct_page_py(3)
    return spark.createDataFrame(
        [(r["doc_id"], r["url"], r["lang"], bytearray(r["html"]))],
        "doc_id long, url string, lang string, html binary",
    )


def test_structdata_extraction_plans_are_zero_shuffle(spark):
    """The per-view extractors, the parse-once frame, and the linked
    triples are all narrow maps: no Exchange anywhere in the plan."""
    from rdf_to_text_spark.operators.structdata import (
        html_infobox,
        html_jsonld,
        html_microdata,
        microdata_linked_triples,
        structdata_facts,
    )

    pages = _one_page_df(spark)
    for op in (
        html_jsonld,
        html_microdata,
        html_infobox,
        structdata_facts,
        microdata_linked_triples,
    ):
        plan = op(pages)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (op.__name__, plan)
        assert "BatchEvalPython" not in plan, op.__name__  # no row-at-a-time UDF


def test_structdata_kg_single_shuffle(spark):
    from rdf_to_text_spark.operators.structdata import structdata_kg

    plan = (
        structdata_kg(_one_page_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # countDistinct(doc_id) compiles to the standard two-phase distinct
    # aggregate: partial agg on (spo, doc_id) -> exchange -> dedup ->
    # partial agg on (spo) -> exchange -> final. Both exchanges carry
    # pre-aggregated rows; nothing re-reads or re-parses pages.
    assert plan.count("Exchange") == 2, plan
    assert plan.count("MapInPandas") == 1, plan  # pages parsed exactly once


def test_marker_fast_path_skips_and_never_drops():
    import time

    # marker-less page: empty views, and ~free even at megabyte size
    big = "<html><body>" + "<p>plain prose</p>" * 50_000 + "</body></html>"
    t0 = time.time()
    out = parse_structdata_py(big)
    fast = time.time() - t0
    assert out == {"jsonld": [], "microdata": [], "infobox": []}
    assert fast < 0.05, fast  # substring scan, not a tokenizer pass

    # each marker alone re-enables the full parse
    assert parse_structdata_py(
        '<div itemscope itemid="X"><meta itemprop="k" content="v"></div>'
    )["microdata"]
    assert parse_structdata_py(
        '<script type="application/ld+json">{"@id":"A","p":"v"}</script>'
    )["jsonld"]
    assert parse_structdata_py(
        '<table class="infobox"><tr><th>K</th><td>V</td></tr></table>'
    )["infobox"]


def test_jsonld_value_and_list_objects_fold_to_scalars():
    rows = flatten_jsonld(
        [
            '{"@id": "X", '
            '"name": {"@value": "Aarhus", "@language": "da"}, '
            '"seq": {"@list": ["a", {"@value": 2}, null]}, '
            '"child": {"p": "v"}}'
        ]
    )
    assert rows == [
        (0, "X", "name", "Aarhus"),
        (0, "X", "seq", "a"),
        (0, "X", "seq", "2"),
        (0, "X", "child", "_:j1"),
        (1, "_:j1", "p", "v"),
    ]


def test_uppercase_markup_is_not_dropped_by_marker_fast_path():
    # HTML names are case-insensitive; the marker scan runs over a
    # lowercased copy so all-uppercase crawl markup still parses (r5
    # ADVICE: the old scan was case-sensitive and returned empty views).
    up_table = '<TABLE CLASS="infobox"><TR><TH>K</TH><TD>V</TD></TR></TABLE>'
    assert parse_structdata_py(up_table)["infobox"] == [(0, 0, "K", "V")]
    up_md = '<DIV ITEMSCOPE ITEMID="X"><META ITEMPROP="k" CONTENT="v"></DIV>'
    assert parse_structdata_py(up_md)["microdata"] == [(0, "X", "k", "v")]
    up_ld = '<SCRIPT TYPE="APPLICATION/LD+JSON">{"@id":"A","p":"v"}</SCRIPT>'
    assert parse_structdata_py(up_ld)["jsonld"] == [(0, "A", "p", "v")]


def test_empty_views_are_fresh_objects_per_call():
    a = parse_structdata_py(None)
    a["infobox"].append(("polluted",))
    b = parse_structdata_py("<p>no markers here</p>")
    assert b["infobox"] == [] and b["jsonld"] == [] and b["microdata"] == []


def test_implied_tr_close_flushes_pending_row():
    # </tr> may be omitted (implied close by the next <tr> or by the
    # table closing); the pending row must be emitted, not overwritten.
    html = (
        '<table class="infobox">'
        "<tr><th>A</th><td>1</td>"      # no </tr>: implied by next <tr>
        "<tr><th>B</th><td>2</td>"      # no </tr>: implied by </table>
        "</table>"
    )
    assert parse_structdata_py(html)["infobox"] == [
        (0, 0, "A", "1"),
        (0, 1, "B", "2"),
    ]
