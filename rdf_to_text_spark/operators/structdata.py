"""Structured-data extraction operators: JSON-LD / microdata / infobox.

The machine-readable half of KG construction from crawl pages (prose
half: `operators/extract.py` + `operators/webtext.py`). Kernels live in
`functions/structparse.py` (one stdlib tokenizer pass per page yields
all three views); here they run as Arrow-batched `mapInPandas` stages —
narrow maps over the page scan, zero shuffle, the same 100 TB shape as
the HTML text extractor: throughput scales with cores, no term grows
with data size until the (optional) corpus-level aggregation.

Reference parity: the reference's KG comes pre-extracted in WebNLG XML
(`webnlg_baseline_input.py:84-120`); a crawl-native pipeline has to
mine the equivalent (subj, pred, obj) facts from the pages themselves,
and schema.org JSON-LD/microdata is where the web actually carries
them.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions.structparse import parse_structdata_py
from .webtext import _exploded

JSONLD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("item_idx", LongType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
    ]
)

MICRODATA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("item_idx", LongType()),
        StructField("subj", StringType()),
        StructField("prop", StringType()),
        StructField("value", StringType()),
    ]
)

INFOBOX_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("table_idx", LongType()),
        StructField("row_idx", LongType()),
        StructField("ikey", StringType()),
        StructField("ival", StringType()),
    ]
)

# The unified parse-once frame: one row per extracted fact across all
# three modalities (infobox facts are page-subject rows: subj = url).
STRUCT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("item_idx", LongType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
    ]
)

# Annotation predicates this fixture/extractor layer mints around the
# relation payload; corpus-level KG building filters them out.
ANNOTATION_PREDS = ("@type", "tags", "source", "sentence", "surface", "page", "prov")


def html_jsonld(pages: DataFrame) -> DataFrame:
    """pages(doc_id, html) → flattened JSON-LD (doc_id, item_idx, subj,
    pred, obj); malformed blocks contribute nothing."""

    def per_doc(doc_id, html):
        for row in parse_structdata_py(html)["jsonld"]:
            yield (int(doc_id), *row)

    return _exploded(pages, ["doc_id", "html"], JSONLD_SCHEMA, per_doc)


def html_microdata(pages: DataFrame) -> DataFrame:
    """pages(doc_id, html) → microdata (doc_id, item_idx, subj, prop,
    value) per the WHATWG source-attribute ladder."""

    def per_doc(doc_id, html):
        for row in parse_structdata_py(html)["microdata"]:
            yield (int(doc_id), *row)

    return _exploded(pages, ["doc_id", "html"], MICRODATA_SCHEMA, per_doc)


def html_infobox(pages: DataFrame) -> DataFrame:
    """pages(doc_id, html) → infobox-table rows (doc_id, table_idx,
    row_idx, ikey, ival); non-infobox tables and th-less rows dropped."""

    def per_doc(doc_id, html):
        for row in parse_structdata_py(html)["infobox"]:
            yield (int(doc_id), *row)

    return _exploded(pages, ["doc_id", "html"], INFOBOX_SCHEMA, per_doc)


def structdata_facts(pages: DataFrame) -> DataFrame:
    """pages(doc_id, url, html) → ONE parse per page, all modalities.

    The production shape: at 100 TB the corpus is tokenized exactly
    once; each downstream consumer filters its modality (Catalyst pushes
    nothing into the Python stage, but the parse amortizes across all
    three views — the same argument as webtext.parse_pages).
    Infobox facts use the page url as subject (the page IS the infobox's
    topic), key as predicate, cell text as object.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {f.name: [] for f in STRUCT_SCHEMA.fields}

            def emit(doc_id, modality, item_idx, subj, pred, obj):
                cols["doc_id"].append(doc_id)
                cols["modality"].append(modality)
                cols["item_idx"].append(item_idx)
                cols["subj"].append(subj)
                cols["pred"].append(pred)
                cols["obj"].append(obj)

            for doc_id, url, html in zip(pdf["doc_id"], pdf["url"], pdf["html"]):
                d = int(doc_id)
                views = parse_structdata_py(html)
                for item_idx, subj, pred, obj in views["jsonld"]:
                    emit(d, "jsonld", item_idx, subj, pred, obj)
                for item_idx, subj, prop, value in views["microdata"]:
                    emit(d, "microdata", item_idx, subj, prop, value)
                for _table_idx, row_idx, key, value in views["infobox"]:
                    emit(d, "infobox", row_idx, url, key, value)
            yield pd.DataFrame(
                {
                    n: pd.Series(
                        cols[n],
                        dtype="int64" if n in ("doc_id", "item_idx") else "object",
                    )
                    for n in cols
                }
            )

    return pages.select("doc_id", "url", "html").mapInPandas(run, STRUCT_SCHEMA)


def structdata_kg(pages: DataFrame) -> DataFrame:
    """Corpus-level KG from the JSON-LD modality: relation rows only
    (annotation predicates dropped), deduped across pages with mention
    counts — (subj, pred, obj, n_docs, n_mentions).

    countDistinct compiles to Spark's two-phase distinct aggregate
    (partial agg on (s,p,o,doc) → exchange → partial agg on (s,p,o) →
    exchange), both phases map-side combined; head-entity skew is
    bounded because every key includes the object.
    """
    facts = html_jsonld(pages).filter(~F.col("pred").isin(*ANNOTATION_PREDS))
    return facts.groupBy("subj", "pred", "obj").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_mentions"),
    )


def structdata_counts(pages: DataFrame) -> DataFrame:
    """Per-page view counts off ONE parse: (doc_id, n_jsonld,
    n_microdata, n_infobox) — the crawl-profiling rollup."""
    counts_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_jsonld", LongType()),
            StructField("n_microdata", LongType()),
            StructField("n_infobox", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nj, nm, nt = [], [], [], []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                views = parse_structdata_py(html)
                ids.append(int(doc_id))
                nj.append(len(views["jsonld"]))
                nm.append(len(views["microdata"]))
                nt.append(len(views["infobox"]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_jsonld": pd.Series(nj, dtype="int64"),
                    "n_microdata": pd.Series(nm, dtype="int64"),
                    "n_infobox": pd.Series(nt, dtype="int64"),
                }
            )

    return pages.select("doc_id", "html").mapInPandas(run, counts_schema)


def microdata_fact_candidates(pages: DataFrame) -> DataFrame:
    """pages(doc_id, html) → (doc_id, item_idx, subj_surface, pred,
    obj_surface): one row per microdata RELATION (annotation props
    dropped), already paired with the item's `surface` property —
    assembled inside the SAME Arrow pass as the parse, so the
    downstream linker needs no self-join and no second parse (at 100 TB
    a join of two parse branches would re-tokenize the corpus twice)."""
    cand_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("item_idx", LongType()),
            StructField("subj_surface", StringType()),
            StructField("pred", StringType()),
            StructField("obj_surface", StringType()),
        ]
    )

    def per_doc(doc_id, html):
        d = int(doc_id)
        surfaces: dict[int, str] = {}
        rels: list[tuple[int, str, str]] = []
        for item_idx, _subj, prop, value in parse_structdata_py(html)["microdata"]:
            if prop == "surface":
                surfaces.setdefault(item_idx, value)
            elif prop not in ANNOTATION_PREDS:
                rels.append((item_idx, prop, value))
        for item_idx, prop, value in rels:
            if item_idx in surfaces:
                yield (d, item_idx, surfaces[item_idx], prop, value)

    return _exploded(pages, ["doc_id", "html"], cand_schema, per_doc)


def microdata_linked_triples(pages: DataFrame) -> DataFrame:
    """Cross-modality entity linking: microdata facts carry SURFACE
    forms (itemprop text/content); resolving both slots through the
    broadcast alias ladder (exact → lowercase → paren-stripped, the
    same ladder prose extraction uses — operators/extract.py:
    _link_series) must reconstruct the canonical KG exactly.

    Plan shape: parse+pair stage (narrow) → one Arrow link stage
    (narrow) — zero shuffle end to end; the alias table is a
    dictionary-sized closure exactly like the reference's S5 alias
    dict (process-cached on executors).
    """
    import pandas as pd  # noqa: F811 (worker-side)
    from pyspark.sql.functions import pandas_udf

    from ..templates import build_alias_index
    from .extract import _link_series

    alias_map = {s: c for s, (c, _cat) in build_alias_index().items()}

    @pandas_udf(StringType())
    def link(s: pd.Series) -> pd.Series:
        return _link_series(s, alias_map)

    cand = microdata_fact_candidates(pages)
    out = cand.select(
        "doc_id",
        link("subj_surface").alias("subj"),
        "pred",
        link("obj_surface").alias("obj"),
    )
    return out.filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())


def jsonld_facts_with_url(pages: DataFrame) -> DataFrame:
    """pages(doc_id, url, html) → JSON-LD RELATION facts with page
    provenance (doc_id, url, item_idx, subj, pred, obj) — the shape the
    production sink unions with prose-extracted triples
    (jobs/run_pipeline.py --structdata). Annotation predicates are
    dropped in-batch; still one narrow Arrow stage, zero shuffle."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("url", StringType()),
            StructField("item_idx", LongType()),
            StructField("subj", StringType()),
            StructField("pred", StringType()),
            StructField("obj", StringType()),
        ]
    )

    def per_doc(doc_id, url, html):
        for item_idx, subj, pred, obj in parse_structdata_py(html)["jsonld"]:
            if pred not in ANNOTATION_PREDS:
                yield (int(doc_id), url, item_idx, subj, pred, obj)

    return _exploded(pages, ["doc_id", "url", "html"], schema, per_doc)
