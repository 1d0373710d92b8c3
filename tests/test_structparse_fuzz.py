"""Hostility fuzz: the structured-data kernel must never raise and must
always return the three list views, whatever bytes a crawl feeds it."""

from hypothesis import given, settings, strategies as st

from rdf_to_text_spark.functions.structparse import parse_structdata_py

_FRAGMENTS = st.sampled_from(
    [
        "<div itemscope", ">", "itemprop='p'", '<script type="application/ld+json">',
        "</script>", "{", "}", '"@id": "x"', "<table class=infobox>", "<tr><th>",
        "</th><td>", "</td></tr>", "</table>", "<template>", "</svg>", "&amp;",
        "&#xZZ;", "text ", "<p>", "</div>", "<!--", "-->", "<![CDATA[", "<meta ",
        'content="v"', "itemscope ", "<time itemprop=t>", "\x00", "é", "𝄞",
    ]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_FRAGMENTS, max_size=40).map("".join))
def test_fragment_soup_never_raises(soup):
    out = parse_structdata_py(soup)
    assert sorted(out) == ["infobox", "jsonld", "microdata"]
    for rows in out.values():
        assert isinstance(rows, list)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_random_bytes_never_raise(payload):
    out = parse_structdata_py(payload)
    assert sorted(out) == ["infobox", "jsonld", "microdata"]
