"""Sitemap source: the crawl-discovery front door (sitemaps.org 0.9).

WARC is how a crawl STORES pages (`sources/warc.py`); sitemaps are how
sites ADVERTISE them — the url-discovery input every production crawl
scheduler consumes next to the link graph. This module parses both
document kinds of the protocol:

  * ``<urlset>`` — leaf sitemaps: per-url ``loc`` (required), optional
    ``lastmod`` / ``changefreq`` / ``priority``;
  * ``<sitemapindex>`` — an index of child sitemap locations (returned
    as rows with ``kind='sitemap'`` so the caller can schedule child
    fetches; this engine has no network, so recursion over an index is
    the CALLER's loop over already-fetched files).

Parsing is stdlib ``xml.etree`` in Arrow batches (the htmltext/WARC
execution pattern: per-file imperative Python inside `mapInPandas`,
narrow, zero shuffle; file = parallelism unit exactly like the WARC
reader). Lenient by construction: a file that fails to parse yields no
rows, never a task error; namespaced and namespace-less documents both
parse (real-world sitemaps are sloppy); whitespace around ``loc`` text
is stripped per spec.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"

SITEMAP_SCHEMA = StructType(
    [
        StructField("sitemap_path", StringType()),
        StructField("kind", StringType()),  # 'url' | 'sitemap'
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),  # W3C datetime, as written
        StructField("changefreq", StringType()),
        StructField("priority", StringType()),
    ]
)


def _text(el, tag: str) -> str | None:
    """Child text under either the spec namespace or none, stripped."""
    child = el.find(_NS + tag)
    if child is None:
        child = el.find(tag)
    if child is None or child.text is None:
        return None
    return child.text.strip() or None


def parse_sitemap_py(payload: bytes | str | None) -> list[tuple]:
    """One sitemap document → [(kind, loc, lastmod, changefreq,
    priority)] in document order; loc-less entries and unparseable
    documents contribute nothing."""
    if payload is None:
        return []
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    try:
        root = ET.fromstring(payload)
    except ET.ParseError:
        return []
    tag = root.tag.rsplit("}", 1)[-1]
    if tag == "urlset":
        kind, entry_tag = "url", "url"
    elif tag == "sitemapindex":
        kind, entry_tag = "sitemap", "sitemap"
    else:
        return []
    rows = []
    for el in list(root.iter(_NS + entry_tag)) or list(root.iter(entry_tag)):
        loc = _text(el, "loc")
        if loc is None:
            continue
        rows.append(
            (
                kind,
                loc,
                _text(el, "lastmod"),
                _text(el, "changefreq"),
                _text(el, "priority"),
            )
        )
    return rows


def read_sitemaps(spark: SparkSession, path_glob: str) -> DataFrame:
    """Directory/glob of sitemap XML files → one row per advertised url
    (or per child sitemap for index files).

    ``binaryFile`` scan → Arrow-batched parse; like the WARC reader the
    FILE is the parallelism unit (sitemaps cap at 50k urls / 50 MB by
    spec, so per-file work is bounded by the protocol itself — the rare
    property that makes file-granular parallelism safe at any scale).
    """
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {f.name: [] for f in SITEMAP_SCHEMA.fields}
            for path, content in zip(pdf["path"], pdf["content"]):
                for kind, loc, lastmod, changefreq, priority in parse_sitemap_py(
                    content
                ):
                    cols["sitemap_path"].append(path)
                    cols["kind"].append(kind)
                    cols["loc"].append(loc)
                    cols["lastmod"].append(lastmod)
                    cols["changefreq"].append(changefreq)
                    cols["priority"].append(priority)
            yield pd.DataFrame({n: pd.Series(cols[n], dtype="object") for n in cols})

    return files.mapInPandas(run, SITEMAP_SCHEMA)


def sitemap_crawl_gap(urls: DataFrame, crawl: DataFrame) -> DataFrame:
    """Crawl scheduling off the advertised url set.

    ``urls``: (loc, lastmod_ts timestamp-or-null) — parsed sitemap rows;
    ``crawl``: (url, warc_ts) — the compacted latest-capture snapshot
    (operators/webtext.py:latest_snapshot output).

    Returns (url, status): ``uncrawled`` (advertised, never captured),
    ``stale`` (advertised lastmod is newer than our capture), ``fresh``
    otherwise. ONE left join on the url key — the whole scheduling
    decision stays declarative, and on bucketed url-keyed tables it is
    a co-located join at any scale.
    """
    from pyspark.sql import functions as F

    j = urls.select(F.col("loc").alias("url"), "lastmod_ts").join(
        crawl.select("url", "warc_ts"), "url", "left"
    )
    return j.select(
        "url",
        F.when(F.col("warc_ts").isNull(), F.lit("uncrawled"))
        .when(
            F.col("lastmod_ts").isNotNull() & (F.col("lastmod_ts") > F.col("warc_ts")),
            F.lit("stale"),
        )
        .otherwise(F.lit("fresh"))
        .alias("status"),
    )
