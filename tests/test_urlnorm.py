"""RFC 3986 normalization spec (functions/urlnorm.py) + Spark wrapper.

Each normalization rule on minimal inputs, the malformed-escape
pass-through guarantee, and the Arrow-batched operator == plain-Python
spec. The oracle side (web_url_normalize_sql) is swept with the
driver's own compare in tests/test_extra_queries.py.
"""

import pytest

from rdf_to_text_spark.functions.urlnorm import (
    _remove_dot_segments,
    normalize_url_py,
)


@pytest.mark.parametrize(
    "url,want",
    [
        # case normalization: scheme + host only, path case preserved
        ("HTTPS://SYNTH.EXAMPLE/Airport/00000007", "https://synth.example/Airport/00000007"),
        ("https://u:p@Host.EX/A", "https://u:p@host.ex/A"),
        # default ports dropped, non-default kept
        ("https://synth.example:443/a", "https://synth.example/a"),
        ("http://synth.example:80/a", "http://synth.example/a"),
        ("http://synth.example:8080/a", "http://synth.example:8080/a"),
        # dot segments
        ("https://synth.example/Airport/x/../00000007", "https://synth.example/Airport/00000007"),
        ("https://synth.example/./a", "https://synth.example/a"),
        ("https://synth.example/a/b/../../c", "https://synth.example/c"),
        # unreserved escapes decoded, reserved uppercased
        ("https://synth.example/%41rchive/f", "https://synth.example/Archive/f"),
        ("https://synth.example/a?b=%42&c=%2f", "https://synth.example/a?b=B&c=%2F"),
        ("https://synth.example/%7Euser", "https://synth.example/~user"),
        # fragment dropped, empty path and empty query defaulted
        ("https://synth.example/a#frag", "https://synth.example/a"),
        ("https://synth.example", "https://synth.example/"),
        ("https://synth.example/a?", "https://synth.example/a"),
        # malformed escapes pass through verbatim
        ("https://synth.example/a%ZZb", "https://synth.example/a%ZZb"),
        ("https://synth.example/a%", "https://synth.example/a%"),
        # relative reference: generic rules only
        ("/rel/./path", "/rel/path"),
    ],
)
def test_normalize_cases(url, want):
    assert normalize_url_py(url) == want


def test_keep_fragment_opt_out():
    assert (
        normalize_url_py("https://synth.example/a#frag", keep_fragment=True)
        == "https://synth.example/a#frag"
    )


def test_idempotent():
    urls = [
        "HTTPS://SYNTH.EXAMPLE:443/a/../b/./c%2f?x=%41#f",
        "https://synth.example/%7E/%ZZ/%2F",
    ]
    for u in urls:
        once = normalize_url_py(u)
        assert normalize_url_py(once) == once


@pytest.mark.parametrize(
    "path,want",
    [
        ("/a/b/c/./../../g", "/a/g"),  # RFC 3986 §5.2.4 example
        ("mid/content=5/../6", "mid/6"),
        ("/..", "/"),
        ("/.", "/"),
        ("..", ""),
        ("", ""),
    ],
)
def test_remove_dot_segments(path, want):
    assert _remove_dot_segments(path) == want


def test_spark_operator_equals_spec(spark):
    from rdf_to_text_spark.operators.webtext import url_normalized

    urls = [
        "HTTPS://SYNTH.EXAMPLE/Food/00000010",
        "https://synth.example:443/City/x/../00000011",
        "https://synth.example/a?b=%42#s",
        None,
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["url_norm"]
        for r in url_normalized(df).select("url", "url_norm").collect()
    }
    for u in urls:
        if u is not None:
            assert got[u] == normalize_url_py(u)
