"""Kernel tests for sources/sitemap.py (the oracle sweep pins the
end-to-end web_sitemap_gap query)."""

from rdf_to_text_spark.sources.sitemap import parse_sitemap_py

_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_urlset_full_fields_and_loc_strip():
    xml = f"""<?xml version="1.0"?><urlset {_NS}>
    <url><loc>  https://a/x  </loc><lastmod>2024-01-01T00:00:00Z</lastmod>
      <changefreq>daily</changefreq><priority>0.8</priority></url>
    <url><loc>https://a/y</loc></url>
    <url><lastmod>2024-01-01T00:00:00Z</lastmod></url>
    </urlset>"""
    assert parse_sitemap_py(xml) == [
        ("url", "https://a/x", "2024-01-01T00:00:00Z", "daily", "0.8"),
        ("url", "https://a/y", None, None, None),
    ]  # loc-less entry dropped


def test_sitemapindex_rows_are_kind_sitemap():
    xml = f"""<sitemapindex {_NS}>
    <sitemap><loc>https://a/s1.xml</loc><lastmod>2024-02-02</lastmod></sitemap>
    </sitemapindex>"""
    assert parse_sitemap_py(xml) == [
        ("sitemap", "https://a/s1.xml", "2024-02-02", None, None)
    ]


def test_namespace_less_documents_parse():
    xml = "<urlset><url><loc>https://a/z</loc></url></urlset>"
    assert parse_sitemap_py(xml) == [("url", "https://a/z", None, None, None)]


def test_malformed_and_foreign_documents_yield_nothing():
    assert parse_sitemap_py(b"<urlset><url><loc>unclosed") == []
    assert parse_sitemap_py("<rss><item/></rss>") == []
    assert parse_sitemap_py(None) == []
