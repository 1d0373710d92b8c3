"""Differential tests: the fast scanner vs the stdlib HTMLParser walk.

The fast path's contract is EQUIVALENCE-OR-FALLBACK: wherever
scan_structdata completes, its _StructParser state must match a full
feed() of the same page; anything outside the tame subset must raise
Untame (and parse_structdata_py then silently uses the full walk).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_to_text_spark.fixtures_struct import render_struct_page_py
from rdf_to_text_spark.fixtures_web import render_rich_page_py
from rdf_to_text_spark.functions import structparse
from rdf_to_text_spark.functions.structparse import _StructParser, parse_structdata_py
from rdf_to_text_spark.functions.structscan import Untame, scan_structdata


def _full(html: str) -> dict:
    p = _StructParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    p.finalize()
    return {"j": p.jsonld_blocks(), "m": p.md_rows, "t": p.tb_rows}


def _fast(html: str) -> dict | None:
    p = _StructParser()
    try:
        scan_structdata(p, html)
    except Untame:
        return None
    p.finalize()
    return {"j": p.jsonld_blocks(), "m": p.md_rows, "t": p.tb_rows}


def _assert_equiv(html: str):
    fast = _fast(html)
    if fast is not None:
        assert fast == _full(html), html[:400]


def test_struct_fixture_corpus_scans_fast_and_equal():
    completed = 0
    for d in range(0, 400):
        html = render_struct_page_py(d)["html"].decode()
        fast = _fast(html)
        assert fast is not None, f"doc {d} fell back"  # fixture is tame
        assert fast == _full(html), f"doc {d}"
        completed += 1
    assert completed == 400


def test_rich_fixture_corpus_equivalence():
    for d in range(0, 200):
        _assert_equiv(render_rich_page_py(d)["html"].decode())


TAME_CASES = [
    # prose-heavy page, carriers sparse
    "<html><body>" + "<p>plain prose itemscope-free</p>" * 50
    + '<div itemscope itemid="X"><meta itemprop="k" content="v"></div>'
    + "</body></html>",
    # needle word in plain text, real carrier after
    "<p>the word itemscope appears in prose</p>"
    '<table class="infobox"><tr><th>K</th><td>V</td></tr></table>',
    # needle inside an attribute VALUE of a skippable tag
    '<p title="itemscope decoy">x</p>'
    '<div itemscope itemid="Y"><span itemprop="a">b</span></div>',
    # quoted '>' before a REAL itemscope in the same tag
    '<div title="a>b" itemscope itemid="Z"><span itemprop="k">v</span></div>',
    # uppercase everything
    '<TABLE CLASS="infobox"><TR><TH>K</TH><TD>V</TD></TR></TABLE>',
    # comments hiding carriers (must stay hidden)
    '<!-- <table class="infobox"><tr><th>A</th><td>1</td></tr></table> -->'
    '<table class="infobox"><tr><th>B</th><td>2</td></tr></table>',
    # doctype + PI + decoy script + entity refs in captured text
    "<!DOCTYPE html><?php notphp ?>"
    '<script type="text/javascript">var x = "<table>"</script>'
    '<div itemscope itemid="E"><span itemprop="amp">a &amp; b</span></div>',
    # unclosed ld+json at EOF (finalize flush)
    '<script type="application/ld+json">{"@id":"A","p":"v"}',
    # CDATA closer with whitespace
    '<script type="application/ld+json">{"@id":"B","q":"w"}</script >',
    # self-closing script mints nothing
    '<script type="application/ld+json"/><p>x</p>',
    # itemprop with no open item is dropped in idle
    '<span itemprop="orphan">x</span><div itemscope itemid="I"></div>',
    # stray end tags between carriers (depth drift must be harmless)
    "</div></span><table class='infobox'><tr><th>K</th><td>V</td></tr></table>",
    # nested template with fake item inside (skip subtree, not CDATA)
    "<template><div itemscope itemid='F'><span itemprop='x'>no</span></div></template>"
    "<div itemscope itemid='R'><span itemprop='y'>yes</span></div>",
    # svg subtree + table inside svg is inert
    "<svg><table class='infobox'><tr><th>N</th><td>1</td></tr></table></svg>"
    "<table class='infobox'><tr><th>M</th><td>2</td></tr></table>",
    # bare '<' as data, then a carrier
    "<p>3 < 5 itemscope</p><div itemscope itemid='L'></div>",
    # '<' inside an attr name: the tolerant grammar eats it (both paths)
    "<div itemscope <span>",
    # '/x' between attrs: tolerant separator, attrs = itemscope + x
    "<div itemscope /x>",
    # stray malformed end tag in idle: skipped as a no-op, carrier kept
    "</div junk><table class='infobox'><tr><th>a</th><td>b</td></tr></table>",
    # quoted '<' BEFORE itemscope in the same tag (the round-6 ADVICE
    # bug: backward classification misread the quoted '<' as text and
    # dropped the item)
    '<div title="a < b" itemscope itemid="Q"><span itemprop="k">v</span></div>',
    # quoted '<' before the infobox class token in the carrier tag
    '<table title="x < y" class="infobox"><tr><th>K</th><td>V</td></tr></table>',
    # quoted '<' followed by an ALPHA char: must not parse a phantom
    # <p...> tag out of the attribute value
    '<div title="<p" itemscope itemid="W"><span itemprop="a">b</span></div>',
    # unquoted attribute value containing '<' (bare-value grammar
    # allows it); the tag still owns the itemscope
    '<div a=b<c itemscope itemid="U"><span itemprop="x">y</span></div>',
    # uppercase carrier with a quoted '<' in the attribute list
    '<DIV TITLE="A < B" ITEMSCOPE ITEMID="C"><SPAN ITEMPROP="P">q</SPAN></DIV>',
    # end-tag junk swallowing a fake carrier (stdlib discards to the
    # first '>'), then a real one
    '</div junk <table class="infobox">'
    '<table class="infobox"><tr><th>R</th><td>1</td></tr></table>',
    # prose '<' data before a bare-word needle, then a real carrier
    "<p>x</p> a < b itemscope word "
    '<div itemscope itemid="T"><span itemprop="m">n</span></div>',
]


@pytest.mark.parametrize("html", TAME_CASES)
def test_tame_cases_complete_and_match(html):
    fast = _fast(html)
    assert fast is not None, "expected the fast path to complete"
    assert fast == _full(html)


UNTAME_CASES = [
    "<![CDATA[ <table class='infobox'> ]]>",       # marked section
    "<!-- never closed <table class='infobox'>",   # unterminated comment
    '<div itemscope a="x>',                  # unterminated quoted value
    "<table class='infobox'></tr junk><tr><th>a</th><td>b</td></tr></table>",
]


@pytest.mark.parametrize("html", UNTAME_CASES)
def test_untame_falls_back_to_full_parse(html):
    assert _fast(html) is None  # scanner refuses
    # ...and the public API still answers via the full walk
    assert parse_structdata_py(html) == {
        "jsonld": _full(html)["j"] and __import__(
            "rdf_to_text_spark.functions.structparse", fromlist=["flatten_jsonld"]
        ).flatten_jsonld(_full(html)["j"]) or [],
        "microdata": [tuple(r) for r in _full(html)["m"]],
        "infobox": [tuple(r) for r in _full(html)["t"]],
    }


_soup = st.text(
    alphabet=st.sampled_from(
        list("<>/=\"' abcdeitemscopeitemproptablescriptldjsoninfobox&#;!-?")
    ),
    max_size=220,
)


@given(_soup)
@settings(max_examples=400, deadline=None)
def test_differential_fuzz_soup(html):
    _assert_equiv(html)


# Attribute-soup shapes: random quoted/unquoted attr junk (including
# '<' and '>' inside quotes) in front of a needle word inside a real
# carrier tag — the shape family of the round-6 ADVICE bug.
_attr_soup = st.text(
    alphabet=st.sampled_from(list("<>\"' =/abitemscope")), max_size=24
)


@given(_attr_soup, st.sampled_from(["itemscope", 'class="infobox"']))
@settings(max_examples=300, deadline=None)
def test_differential_fuzz_quoted_attrs(attrs, needle_attr):
    tag = "table" if "infobox" in needle_attr else "div"
    _assert_equiv(
        f"<p>prose</p><{tag} {attrs} {needle_attr} id='z'>"
        f"<tr><th>K</th><td>V</td></tr><span itemprop='k'>v</span></{tag}>"
    )


@given(_attr_soup)
@settings(max_examples=200, deadline=None)
def test_differential_fuzz_idle_span_junk(junk):
    # junk (possibly containing stray '<'/quotes) in PLAIN TEXT before
    # a bare needle word, then a real carrier — classification must not
    # let span junk leak into or hide the carrier
    _assert_equiv(
        f"<p>a</p>{junk} itemscope "
        '<div itemscope itemid="J"><span itemprop="p">q</span></div>'
    )


@given(st.binary(max_size=200))
@settings(max_examples=150, deadline=None)
def test_differential_fuzz_bytes(payload):
    _assert_equiv(payload.decode("utf-8", errors="replace"))


@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=80, deadline=None)
def test_differential_fuzz_fixture_ids(d):
    _assert_equiv(render_struct_page_py(d)["html"].decode())


def test_kernel_flag_pins_full_walk(monkeypatch):
    html = render_struct_page_py(7)["html"].decode()
    want = parse_structdata_py(html)
    monkeypatch.setattr(structparse, "KERNEL", "full")
    assert parse_structdata_py(html) == want


# ---------------------------------------------------------------- htmltext
def _full_views(html: str) -> dict:
    from rdf_to_text_spark.functions import htmltext

    p = htmltext._TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return {"t": p.text(), "b": p.blocks(), "l": p.links(), "m": p.metas()}


def _fast_views(html: str) -> dict | None:
    from rdf_to_text_spark.functions import htmltext
    from rdf_to_text_spark.functions.structscan import feed_events

    p = htmltext._TextExtractor()
    try:
        feed_events(p, html)
    except Untame:
        return None
    return {"t": p.text(), "b": p.blocks(), "l": p.links(), "m": p.metas()}


def test_feed_events_rich_corpus_equivalence_and_completion():
    for d in range(0, 300):
        html = render_rich_page_py(d)["html"].decode()
        fast = _fast_views(html)
        assert fast is not None, f"doc {d} fell back"  # fixture is tame
        assert fast == _full_views(html), f"doc {d}"


@given(_soup)
@settings(max_examples=300, deadline=None)
def test_feed_events_differential_fuzz(html):
    fast = _fast_views(html)
    if fast is not None:
        assert fast == _full_views(html), html[:200]


def test_htmltext_kernel_flag_pins_full_walk(monkeypatch):
    from rdf_to_text_spark.functions import htmltext

    html = render_rich_page_py(11)["html"]
    want = htmltext.parse_all_py(html)
    monkeypatch.setattr(htmltext, "KERNEL", "full")
    assert htmltext.parse_all_py(html) == want


def test_plain_tables_skip_but_infobox_still_found():
    # '<table' is not a needle: plain tables are idle no-ops; the
    # 'infobox' class literal (any tag-name case) re-enters event mode.
    html = (
        "<table><tr><th>plain</th><td>ignored</td></tr></table>" * 20
        + '<TABLE CLASS="infobox"><tr><th>K</th><td>V</td></tr></TABLE>'
        + "<table class='data'><tr><th>D</th><td>x</td></tr></table>"
    )
    fast = _fast(html)
    assert fast is not None and fast == _full(html)
    assert fast["t"] == [[0, 0, "K", "V"]]


def test_unclosed_plain_table_shadowing_infobox_equivalence():
    # tag soup: an unclosed plain table open when the infobox starts —
    # the untracked outer table must not shift infobox rows or pops.
    html = (
        "<table><tr><td>soup"  # unclosed plain table + unclosed row
        '<table class="infobox"><tr><th>A</th><td>1</td></tr></table>'
        "</table></table>"
        '<div itemscope itemid="X"><span itemprop="k">v</span></div>'
    )
    fast = _fast(html)
    assert fast is not None and fast == _full(html)


# ------------------------------------------------- htmltext fused kernel
def _fused_views(html: str) -> dict | None:
    from rdf_to_text_spark.functions import htmltext
    from rdf_to_text_spark.functions.structscan import _ASCII_LOWER

    p = htmltext._TextExtractor()
    try:
        htmltext._fused_feed(p, html, html.translate(_ASCII_LOWER))
    except Exception:
        return None
    return {"t": p.text(), "b": p.blocks(), "l": p.links(), "m": p.metas()}


def test_fused_feed_rich_corpus_equivalence_and_completion():
    for d in range(0, 300):
        html = render_rich_page_py(d)["html"].decode()
        fast = _fused_views(html)
        assert fast is not None, f"doc {d} fell back"  # fixture is tame
        assert fast == _full_views(html), f"doc {d}"


def test_fused_feed_struct_corpus_equivalence():
    # the struct fixture (uppercase/mixed-case slices included) through
    # the TEXT extractor: inert-tag skipping must not change any view
    for d in range(0, 200):
        html = render_struct_page_py(d)["html"].decode()
        fast = _fused_views(html)
        if fast is not None:
            assert fast == _full_views(html), f"doc {d}"


@given(_soup)
@settings(max_examples=300, deadline=None)
def test_fused_feed_differential_fuzz(html):
    fast = _fused_views(html)
    if fast is not None:
        assert fast == _full_views(html), html[:200]


@given(_attr_soup)
@settings(max_examples=200, deadline=None)
def test_fused_feed_fuzz_anchor_meta_attrs(attrs):
    # attribute soup on the INTERESTING tags (a/meta carry values the
    # extractor reads) around inert-tag neighbors
    html = (
        f"<p>x <b>y</b> <a {attrs} href='/h'>t</a> "
        f"<meta {attrs} name='n' content='c'><span>z</span></p>"
    )
    fast = _fused_views(html)
    if fast is not None:
        assert fast == _full_views(html), html[:200]
