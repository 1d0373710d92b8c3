"""kg_e2e_crawl: the composed crawl pipeline and its dedup margins.

The E2E hash gate (driver) only says "something broke"; these tests pin
WHERE the margins live so a regression is local:

  * the near-dup threshold 0.75 sits between the mirror-pair jaccard
    bracket [0.86, 0.95] and the max cross-doc jaccard 0.67 — measured,
    not assumed, over the full 500-doc fixture corpus;
  * every mirror pair is an LSH candidate (band collision is a
    deterministic fact of the fixed-seed signatures — checked, since
    est. P(miss) ~ 3e-8/pair is not a proof);
  * the verify rung keeps exactly the mirror pairs at 0.75.
"""

from __future__ import annotations

import re

import pytest

from rdf_to_text_spark.fixtures_web import render_rich_page_py

MIRROR_LINE = "mirrored archive copy"
N_DOCS = 500  # both sf0.001 and sf0.01 documents tables


def _grams(text: str, n: int = 3) -> set[str]:
    """Distinct word n-grams — the exact semantics of
    operators.dedup.ngram_jaccard's engine-side expression."""
    toks = re.split(r"\s+", text.strip().lower())
    m = max(len(toks) - n, 0)
    return {" ".join(toks[i : i + n]) for i in range(m + 1)}


def _jac(a: set, b: set) -> float:
    u = len(a | b)
    return len(a & b) / (u or 1)


@pytest.fixture(scope="module")
def corpus():
    pages = {d: render_rich_page_py(d) for d in range(N_DOCS)}
    en = {d: p["text"] for d, p in pages.items() if p["lang"] == "en"}
    return en


def test_dedup_threshold_margins(corpus):
    grams = {d: _grams(t) for d, t in corpus.items()}
    mirror_j = [
        _jac(grams[d], _grams(t + "\n" + MIRROR_LINE))
        for d, t in corpus.items()
        if d % 7 == 3
    ]
    assert len(mirror_j) > 50
    assert min(mirror_j) > 0.80, "mirror pair fell below the drop band"
    cross_max = 0.0
    ks = sorted(grams)
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            cross_max = max(cross_max, _jac(grams[a], grams[b]))
    assert cross_max < 0.70, f"cross-doc jaccard {cross_max} crowds threshold"
    # the threshold the query uses must sit strictly inside the gap
    assert cross_max < 0.75 < min(mirror_j)


def test_mirror_pairs_candidates_and_verify(spark, corpus):
    """Deterministic dedup outcome on the E2E text set: every mirror
    pair is an LSH candidate AND verifies >= 0.75; no cross pair does."""
    from pyspark.sql import functions as F

    from rdf_to_text_spark.operators import dedup
    from rdf_to_text_spark.queries_catalog import _MIRROR_BASE

    rows = [(d, t) for d, t in corpus.items()]
    rows += [
        (d + _MIRROR_BASE, t + "\n" + MIRROR_LINE)
        for d, t in corpus.items()
        if d % 7 == 3
    ]
    texts = spark.createDataFrame(rows, "doc_id long, text string")
    cleanup = []
    cands = dedup.minhash_lsh_candidates_md5(texts, cleanup=cleanup)
    verified = (
        dedup.ngram_jaccard(texts, cands.select("doc_a", "doc_b"), n=3)
        .filter(F.col("jaccard") >= 0.75)
        .collect()
    )
    for h in cleanup:
        h.unpersist()
    got_pairs = {(r.doc_a, r.doc_b) for r in verified}
    want_pairs = {
        (d, d + _MIRROR_BASE) for d in corpus if d % 7 == 3
    }
    assert got_pairs == want_pairs


def test_e2e_crawl_matches_oracle(spark):
    """Full chain vs the gold+CC oracle at sf0.001 — the driver's own
    compare, kept here so a break is caught before the round gate."""
    import duckdb

    from rdf_to_text_spark import queries_catalog as QC

    sf = "/root/testdata/sf0.001"
    got = QC.QUERIES["kg_e2e_crawl"](spark, sf).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exp = con.sql(QC.ORACLES["kg_e2e_crawl"]).df()
    QC.release_caches()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = exp[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(a) == len(b) and a.equals(b)
