"""Deterministic synthetic pages + gold triples (and their SQL twin).

``doc_id → page`` is a pure integer-arithmetic function (FIXTURES.md §7),
so the *same* contract can be evaluated three ways:

  1. :func:`render_page_py` — plain Python (unit tests);
  2. :func:`pages_from_documents` — Spark, Arrow-batched pandas UDF
     (the pipeline's input at any scale);
  3. :func:`gold_triples_sql` — generated ANSI SQL (the DuckDB oracle
     the driver runs; it computes the *expected output* of the whole
     extraction pipeline without ever rendering text).

Rendering follows the reference's relexicalization semantics
(`webnlg_eval_scripts/webnlg_baseline_input.py:191-211`): each slot key
``ENTITIES_k `` is replaced by ``surface + ' '`` in sorted key order.

Arithmetic contract (mirrored literally in the SQL):
  n_sent(d)            = 1 + d % 3
  lang(d)              = 'en' if d % 20 != 0 else 'xx'
  filler(d, s)         = (d*31 + s*17) % 10 == 0
  template t(d, s)     = (d*7 + s*13) % T
  raws(d, s)           = d*11 + s*5
  subj_idx             = 0 if raws % 5 < 2 else raws % |subj_pool(t)|   (Zipf-ish head skew)
  rawo(d, s)           = d*3 + s*2
  obj_idx              = rawo % |obj_pool(t)|
  subj variant v(d, s) = (d + s) % |variants(subj)|
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .functions.textnorm import clean_surface
from .templates import ENTITIES, FILLERS, OBJ_POOLS, TEMPLATES, surface_variants

_T = len(TEMPLATES)

# Precomputed surface caches (renders are hot: one call per sentence).
_SUBJ_VARIANTS: dict[str, list[list[str]]] = {
    cat: [surface_variants(e) for e in names] for cat, names in ENTITIES.items()
}
_OBJ_SURFACES: dict[str, list[str]] = {
    pool: [clean_surface(o) for o in names] for pool, names in OBJ_POOLS.items()
}


def _subj_pool(t: int) -> list[str]:
    return ENTITIES[TEMPLATES[t][1]]


def _obj_pool(t: int) -> list[str]:
    return OBJ_POOLS[TEMPLATES[t][2]]


def _render_sentence(d: int, s: int) -> tuple[str, tuple[str, str, str] | None]:
    """One sentence for (doc_id, sent_idx): (text, gold_triple_or_None)."""
    if (d * 31 + s * 17) % 10 == 0:
        return FILLERS[(d * 13 + s) % len(FILLERS)] + " .", None
    t = (d * 7 + s * 13) % _T
    pred, _cat, _opool, pattern = TEMPLATES[t]
    spool, opool = _subj_pool(t), _obj_pool(t)
    raws = d * 11 + s * 5
    subj_idx = 0 if raws % 5 < 2 else raws % len(spool)
    obj_idx = (d * 3 + s * 2) % len(opool)
    subj, obj = spool[subj_idx], opool[obj_idx]
    variants = surface_variants(subj)
    subj_surface = variants[(d + s) % len(variants)]
    obj_surface = clean_surface(obj)
    # relex semantics: sorted(rplc) replace of 'KEY ' -> 'surface '
    sent = pattern
    for key, val in sorted({"ENTITIES_1": subj_surface, "ENTITIES_2": obj_surface}.items()):
        sent = sent.replace(key + " ", val + " ")
    return sent, (subj, pred, obj)


def render_page_py(doc_id: int) -> dict:
    """Pure-Python page render (the contract's executable spec)."""
    n_sent = 1 + doc_id % 3
    sents, gold = [], []
    for s in range(n_sent):
        text, triple = _render_sentence(doc_id, s)
        sents.append(text)
        if triple is not None:
            gold.append((doc_id, s, *triple))
    text = " ".join(sents)
    cat = TEMPLATES[(doc_id * 7) % _T][1]
    return {
        "url": f"https://synth.example/{cat}/{doc_id:08d}",
        "doc_id": doc_id,
        "html": b"<html><body><p>" + text.encode() + b"</p></body></html>",
        "text": text,
        "lang": "en" if doc_id % 20 != 0 else "xx",
        "gold": gold,
    }


PAGES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the Common-Crawl-shaped ``pages`` table from the driver's
    ``documents`` parquet (doc_id is the only input — text is rendered).

    Uses ``mapInPandas`` so the render is Arrow-batched; at 100 TB the
    real pipeline replaces this source with an Iceberg scan of actual
    pages — everything downstream is source-agnostic.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    # The driver's parquet is a single tiny file → one input split; spread the
    # render across the cluster. (On a real 100 TB Iceberg source this is a
    # no-op — splits already cover the executors.)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base_ts = pd.Timestamp("2024-01-01T00:00:00")
        for pdf in batches:
            rows = [render_page_py(int(d)) for d in pdf["doc_id"]]
            out = pd.DataFrame(
                {
                    "doc_id": [r["doc_id"] for r in rows],
                    "url": [r["url"] for r in rows],
                    "warc_ts": [base_ts + pd.Timedelta(seconds=r["doc_id"]) for r in rows],
                    "html": [r["html"] for r in rows],
                    "text": [r["text"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                }
            )
            yield out

    return docs.mapInPandas(gen, PAGES_SCHEMA)


def pages_from_range(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Render n_docs synthetic pages from a pure id range (bench source).

    Same contract as :func:`pages_from_documents` but scale-free: the
    input is ``spark.range`` so benchmarks can size the corpus
    independently of the driver's parquet fixtures.
    """
    par = partitions or spark.sparkContext.defaultParallelism
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id").repartition(par, "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base_ts = pd.Timestamp("2024-01-01T00:00:00")
        for pdf in batches:
            rows = [render_page_py(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r["doc_id"] for r in rows],
                    "url": [r["url"] for r in rows],
                    "warc_ts": [base_ts + pd.Timedelta(seconds=r["doc_id"]) for r in rows],
                    "html": [r["html"] for r in rows],
                    "text": [r["text"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                }
            )

    return docs.mapInPandas(gen, PAGES_SCHEMA)


def gold_triples_py(doc_ids: list[int]) -> list[tuple[int, int, str, str, str]]:
    """Expected pipeline output (en-pages only) for the given doc_ids."""
    out = []
    for d in doc_ids:
        if d % 20 == 0:
            continue
        for row in render_page_py(d)["gold"]:
            out.append(row)
    return out


# ------------------------------------------------------------------ oracle
def _values(rows: list[tuple]) -> str:
    def lit(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    return ",\n    ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)


def gold_cte(include_xx: bool = False) -> str:
    """Shared WITH-clause body: a ``gold`` relation with columns
    (doc_id, sent_idx, subj, pred, obj, subj_surface, obj_surface,
    category) computed from doc_id arithmetic alone.

    Embed as ``WITH {gold_cte()} SELECT ... FROM gold``.
    """
    tmpl_rows = [
        (t, pred, cat, len(ENTITIES[cat]), opool, len(OBJ_POOLS[opool]))
        for t, (pred, cat, opool, _pat) in enumerate(TEMPLATES)
    ]
    spool_rows = [
        (cat, i, name, len(_SUBJ_VARIANTS[cat][i]))
        for cat, names in ENTITIES.items()
        for i, name in enumerate(names)
    ]
    svar_rows = [
        (cat, i, v, surf)
        for cat, names in ENTITIES.items()
        for i, _name in enumerate(names)
        for v, surf in enumerate(_SUBJ_VARIANTS[cat][i])
    ]
    opool_rows = [
        (pool, i, name, _OBJ_SURFACES[pool][i])
        for pool, names in OBJ_POOLS.items()
        for i, name in enumerate(names)
    ]
    lang_filter = "" if include_xx else "WHERE d.doc_id % 20 <> 0"
    return f"""nums(s) AS (VALUES (0), (1), (2)),
sent AS (
  SELECT d.doc_id, n.s
  FROM documents d JOIN nums n ON n.s < 1 + (d.doc_id % 3)
  {lang_filter}
),
hit AS (
  SELECT doc_id, s,
         ((doc_id*7 + s*13) % {_T}) AS t,
         (doc_id*11 + s*5) AS raws,
         (doc_id*3 + s*2) AS rawo
  FROM sent
  WHERE (doc_id*31 + s*17) % 10 <> 0
),
tmpl(t, pred, scat, ssize, opool, osize) AS (VALUES
    {_values(tmpl_rows)}
),
spool(cat, idx, name, nvar) AS (VALUES
    {_values(spool_rows)}
),
svar(cat, idx, vidx, surface) AS (VALUES
    {_values(svar_rows)}
),
opool(pool, idx, name, surface) AS (VALUES
    {_values(opool_rows)}
),
gold AS (
  SELECT CAST(h.doc_id AS BIGINT) AS doc_id,
         CAST(h.s AS INT) AS sent_idx,
         sp.name AS subj,
         tm.pred AS pred,
         op.name AS obj,
         sv.surface AS subj_surface,
         op.surface AS obj_surface,
         tm.scat AS category
  FROM hit h
  JOIN tmpl tm ON tm.t = h.t
  JOIN spool sp ON sp.cat = tm.scat
    AND sp.idx = CASE WHEN h.raws % 5 < 2 THEN 0 ELSE h.raws % tm.ssize END
  JOIN svar sv ON sv.cat = sp.cat AND sv.idx = sp.idx
    AND sv.vidx = (h.doc_id + h.s) % sp.nvar
  JOIN opool op ON op.pool = tm.opool AND op.idx = h.rawo % tm.osize
)"""


def gold_triples_sql() -> str:
    """Flagship oracle: expected extraction output from arithmetic alone."""
    return f"WITH {gold_cte()} SELECT doc_id, sent_idx, subj, pred, obj FROM gold"


# ----------------------------------------------------- crawl generation 2
# A second crawl of the same corpus, for incremental-KG (snapshot delta)
# checks: every 11th url has dropped out of the crawl (site gone), every
# 7th surviving page gained one revision sentence rendered from shifted
# arithmetic (doc_id + _V2_SHIFT, sentence slot 0) — so both delta
# classes (removed facts, added facts) are closed-form doc_id arithmetic.
_V2_SHIFT = 7777


def render_page_v2_py(doc_id: int) -> dict:
    """Generation-2 render of a surviving page (call only for
    doc_id % 11 != 0): the flagship page, plus one appended revision
    sentence on every 7th doc. The appended sentence may be a filler
    (no triple) or may duplicate an existing fact — the delta operator
    and its oracle both treat facts as sets, so those cases cancel."""
    r = render_page_py(doc_id)
    if doc_id % 7 == 0:
        extra, _triple = _render_sentence(doc_id + _V2_SHIFT, 0)
        text = r["text"] + " " + extra
        r["text"] = text
        r["html"] = b"<html><body><p>" + text.encode() + b"</p></body></html>"
    return r


def pages_v2_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generation-2 pages table: same shape as
    :func:`pages_from_documents`, urls with doc_id % 11 == 0 absent,
    every 7th surviving page revised."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    docs = docs.filter(F.col("doc_id") % 11 != 0)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base_ts = pd.Timestamp("2024-02-01T00:00:00")
        for pdf in batches:
            rows = [render_page_v2_py(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r["doc_id"] for r in rows],
                    "url": [r["url"] for r in rows],
                    "warc_ts": [base_ts + pd.Timedelta(seconds=r["doc_id"]) for r in rows],
                    "html": [r["html"] for r in rows],
                    "text": [r["text"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                }
            )

    return docs.mapInPandas(gen, PAGES_SCHEMA)


def snapshot_delta_sql() -> str:
    """Oracle for the incremental-KG delta between the two crawl
    generations: removed = facts of vanished urls; added = the revision
    sentence's fact where it is non-filler AND not already a fact of
    the page (set semantics — EXCEPT on both sides)."""
    return f"""WITH {gold_cte()},
chg AS (
  SELECT d.doc_id, d.doc_id + {_V2_SHIFT} AS x
  FROM documents d
  WHERE d.doc_id % 7 = 0 AND d.doc_id % 11 <> 0 AND d.doc_id % 20 <> 0
),
chg_hit AS (
  SELECT doc_id, (x*7) % {_T} AS t, x*11 AS raws, x*3 AS rawo
  FROM chg WHERE (x*31) % 10 <> 0
),
appended AS (
  SELECT h.doc_id, sp.name AS subj, tm.pred AS pred, op.name AS obj
  FROM chg_hit h
  JOIN tmpl tm ON tm.t = h.t
  JOIN spool sp ON sp.cat = tm.scat
    AND sp.idx = CASE WHEN h.raws % 5 < 2 THEN 0 ELSE h.raws % tm.ssize END
  JOIN opool op ON op.pool = tm.opool AND op.idx = h.rawo % tm.osize
),
old_facts AS (SELECT DISTINCT doc_id, subj, pred, obj FROM gold),
new_facts AS (
  SELECT DISTINCT doc_id, subj, pred, obj FROM (
    SELECT doc_id, subj, pred, obj FROM gold WHERE doc_id % 11 <> 0
    UNION ALL
    SELECT doc_id, subj, pred, obj FROM appended
  )
)
SELECT doc_id, subj, pred, obj, 'removed' AS change
FROM (SELECT * FROM old_facts EXCEPT SELECT * FROM new_facts)
UNION ALL
SELECT doc_id, subj, pred, obj, 'added' AS change
FROM (SELECT * FROM new_facts EXCEPT SELECT * FROM old_facts)"""


# ------------------------------------------------- co-occurrence / linking
def _capped_incidence_cte(cap: int) -> str:
    """Shared CTE chain (requires ``gold`` + ``ents`` in scope): in-page
    entity incidence (subjects always; objects when entity-like) →
    per-doc support → per-doc cap by (support desc, entity asc) →
    ``inc(doc_id, entity)``. Replays operators/linking.py:
    capped_entity_pairs ranking arithmetic exactly."""
    return f"""incall AS (
  SELECT doc_id, subj AS entity FROM gold
  UNION ALL
  SELECT g.doc_id, g.obj AS entity FROM gold g JOIN ents e ON e.entity = g.obj
),
incsup AS (SELECT doc_id, entity, COUNT(*) AS sup FROM incall GROUP BY 1, 2),
inc AS (
  SELECT doc_id, entity FROM (
    SELECT doc_id, entity,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY sup DESC, entity ASC) AS rnk
    FROM incsup)
  WHERE rnk <= {cap}
)"""


def cooccurrence_capped_sql(cap: int = 4) -> str:
    """Oracle for kg_entity_cooccurrence: capped in-page entity pairs."""
    from .templates import entity_like_names

    ents = [(e,) for e in entity_like_names()]
    return f"""WITH {gold_cte()},
ents(entity) AS (VALUES
    {_values(ents)}
),
{_capped_incidence_cte(cap)}
SELECT a.entity AS e1, b.entity AS e2, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.entity < b.entity
GROUP BY 1, 2"""


def link_prior_sql(cap: int = 4) -> str:
    """Oracle for kg_link_prior: replay the two-signal prior-reranked
    linking arithmetic — first-token alias candidates (VALUES, from the
    same templates constants the Spark build side broadcasts), capped
    co-occurrence prior, anchor-support counts (corpus usage of the
    surface for the entity), score = 10·cooc + 1·anchor_support,
    winner by (score desc, entity asc)."""
    from .templates import entity_like_names, first_token_candidates

    ents = [(e,) for e in entity_like_names()]
    cands = first_token_candidates()
    return f"""WITH {gold_cte()},
ents(entity) AS (VALUES
    {_values(ents)}
),
cand(mention, entity) AS (VALUES
    {_values(cands)}
),
{_capped_incidence_cte(cap)},
prior AS (
  SELECT a.entity AS e1, b.entity AS e2, COUNT(*) AS n_docs
  FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.entity < b.entity
  GROUP BY 1, 2
),
anch AS (
  SELECT lower(list_extract(regexp_split_to_array(obj_surface, ' '), 1)) AS mention,
         obj AS entity, COUNT(*) AS n_refs
  FROM gold GROUP BY 1, 2
),
ment AS (
  SELECT doc_id, sent_idx, subj AS anchor,
         lower(list_extract(regexp_split_to_array(obj_surface, ' '), 1)) AS mention
  FROM gold
),
scored AS (
  SELECT m.doc_id, m.sent_idx, m.mention, c.entity,
         10 * COALESCE(p.n_docs, 0) + COALESCE(an.n_refs, 0) AS score,
         row_number() OVER (PARTITION BY m.doc_id, m.sent_idx, m.mention
                            ORDER BY 10 * COALESCE(p.n_docs, 0)
                                     + COALESCE(an.n_refs, 0) DESC,
                                     c.entity ASC) AS rn
  FROM ment m
  JOIN cand c ON c.mention = m.mention
  LEFT JOIN prior p ON p.e1 = least(c.entity, m.anchor)
                   AND p.e2 = greatest(c.entity, m.anchor)
  LEFT JOIN anch an ON an.mention = m.mention AND an.entity = c.entity
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(sent_idx AS INT) AS sent_idx,
       mention, entity, CAST(score AS BIGINT) AS score
FROM scored WHERE rn = 1"""


def schema_classes_sql() -> str:
    """Oracle for kg_schema_classes: per-predicate cardinality class
    (1:1 / 1:N / N:1 / N:N from max out/in distinct-degree) + domain/
    range type guesses (entity vs literal via the KB node set)."""
    from .templates import entity_like_names

    ents = [(e,) for e in entity_like_names()]
    return f"""WITH {gold_cte()},
ents(entity) AS (VALUES
    {_values(ents)}
),
po AS (SELECT pred, subj, COUNT(DISTINCT obj) AS n_obj FROM gold GROUP BY 1, 2),
ps AS (SELECT pred, obj, COUNT(DISTINCT subj) AS n_subj FROM gold GROUP BY 1, 2),
deg AS (
  SELECT po.pred, MAX(po.n_obj) AS max_out, MAX(ps.n_subj) AS max_in
  FROM po JOIN ps ON ps.pred = po.pred
  GROUP BY po.pred
),
typ AS (
  SELECT g.pred,
         CASE WHEN COUNT(*) = COUNT(es.entity) THEN 'entity'
              WHEN COUNT(es.entity) = 0 THEN 'literal'
              ELSE 'mixed' END AS domain_type,
         CASE WHEN COUNT(*) = COUNT(eo.entity) THEN 'entity'
              WHEN COUNT(eo.entity) = 0 THEN 'literal'
              ELSE 'mixed' END AS range_type
  FROM gold g
  LEFT JOIN ents es ON es.entity = g.subj
  LEFT JOIN ents eo ON eo.entity = g.obj
  GROUP BY g.pred
)
SELECT d.pred,
       CAST(d.max_out AS BIGINT) AS max_out,
       CAST(d.max_in AS BIGINT) AS max_in,
       CASE WHEN d.max_out = 1 AND d.max_in = 1 THEN '1:1'
            WHEN d.max_out > 1 AND d.max_in = 1 THEN '1:N'
            WHEN d.max_out = 1 AND d.max_in > 1 THEN 'N:1'
            ELSE 'N:N' END AS card_class,
       t.domain_type, t.range_type
FROM deg d JOIN typ t ON t.pred = d.pred"""


def meteor_default_syn_sql() -> str:
    """Oracle for eval_meteor_default_syn: hyp = corpus text, ref = the
    same tokens with every DEFAULT_SYNONYM_CLASSES member swapped to the
    next member of its class (cyclic) — so those positions can only
    match through the synonym stage. Replay: m = Σ_class min(count_h,
    count_r) over class-mapped tokens (stage identity: exact-first then
    class-residual pairing sums to the class-level min, since
    min(x−e, y−e) = min(x,y) − e); m_syn = m − Σ_word min(count_h,
    count_r). Chunks are pinned by the staged suffix twin
    (eval_meteor_synonyms), not re-replayed here."""
    from .operators.evalmetrics import DEFAULT_SYNONYM_CLASSES

    syn_rows = [
        (w, cls[0]) for cls in DEFAULT_SYNONYM_CLASSES for w in cls
    ]
    swap_rows = [
        (w, cls[(i + 1) % len(cls)])
        for cls in DEFAULT_SYNONYM_CLASSES
        for i, w in enumerate(cls)
    ]
    return rf"""WITH docs AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE trim(text) <> ''
),
syn(word, cls) AS (VALUES
    {_values(syn_rows)}
),
swap(word, alt) AS (VALUES
    {_values(swap_rows)}
),
ht AS (SELECT doc_id, unnest(toks) AS t FROM docs),
rt AS (
  SELECT x.doc_id, coalesce(sw.alt, x.t) AS t
  FROM ht x LEFT JOIN swap sw ON sw.word = x.t
),
hw AS (SELECT doc_id, t, COUNT(*) AS n FROM ht GROUP BY 1, 2),
rw AS (SELECT doc_id, t, COUNT(*) AS n FROM rt GROUP BY 1, 2),
me AS (
  SELECT h.doc_id, SUM(LEAST(h.n, r.n)) AS me
  FROM hw h JOIN rw r ON r.doc_id = h.doc_id AND r.t = h.t
  GROUP BY 1
),
hc AS (
  SELECT x.doc_id, coalesce(sy.cls, x.t) AS c, COUNT(*) AS n
  FROM ht x LEFT JOIN syn sy ON sy.word = x.t GROUP BY 1, 2
),
rc AS (
  SELECT x.doc_id, coalesce(sy.cls, x.t) AS c, COUNT(*) AS n
  FROM rt x LEFT JOIN syn sy ON sy.word = x.t GROUP BY 1, 2
),
mm AS (
  SELECT h.doc_id, SUM(LEAST(h.n, r.n)) AS m
  FROM hc h JOIN rc r ON r.doc_id = h.doc_id AND r.c = h.c
  GROUP BY 1
)
SELECT CAST(d.doc_id AS BIGINT) AS id,
       CAST(coalesce(mm.m, 0) AS INT) AS m,
       CAST(coalesce(mm.m, 0) - coalesce(me.me, 0) AS INT) AS m_syn,
       CAST(len(d.toks) AS INT) AS hyp_len,
       CAST(len(d.toks) AS INT) AS ref_len
FROM docs d
LEFT JOIN mm ON mm.doc_id = d.doc_id
LEFT JOIN me ON me.doc_id = d.doc_id"""
