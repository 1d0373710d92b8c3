"""Deterministic *realistic* web pages + a by-construction text oracle.

`fixtures.py` renders minimal pages (``<html><body><p>text``) because the
flagship contract there is byte-identical normalization. This module
renders the same doc_id arithmetic into a REALISTIC Common-Crawl-style
page — doctype, comments, head with title/style/script, nav boilerplate,
inline markup inside paragraphs, noscript/template subtrees, entity
references, a footer — so the production HTML→text extractor
(`functions/htmltext.py`) has something honest to chew on.

Same three-way contract as `fixtures.py`:

  1. :func:`render_rich_page_py` — plain Python render AND the expected
     extracted text (the executable spec);
  2. :func:`rich_pages_from_documents` / :func:`rich_pages_from_range`
     — Spark, Arrow-batched;
  3. :func:`rich_text_sql` — generated DuckDB SQL reconstructing the
     ENTIRE expected text (title line, nav lines, heading, every
     sentence with relex-replayed surfaces, decoded-entity footer) from
     doc_id arithmetic alone — the oracle never parses HTML.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .fixtures import _render_sentence, _values, gold_cte
from .templates import FILLERS, TEMPLATES

_T = len(TEMPLATES)

_FOOTER_TEXT = "© 2024 Synth <Example>"
_FOOTER_HTML = "&copy; 2024 Synth &lt;Example&gt;"

# Non-f-string fragments: raw braces + markup that must reach the parser
# verbatim (style content with a fake tag in a string, script with && and
# an entity that must NOT be decoded because script text is skipped).
_STYLE = '<style>body { color: #123; } p::before { content: "<junk>"; }</style>'
_SCRIPT_TMPL = (
    '<script type="text/javascript">var n = %d; '
    'if (n < 9999 && n >= 0) { console.log("skip &amp; ignore"); }</script>'
)


def render_rich_page_py(doc_id: int) -> dict:
    """Realistic page render + its expected extracted text.

    The visible-text contract (what `extract_text_rich_py` must emit):
      line 1           : ``Doc {d} & the {cat} page``   (title, &amp; decoded)
      lines 2-3        : ``Home`` / ``About``           (nav <li> items)
      line 4           : ``Entry {d}``                  (h1 with inline span)
      lines 5..4+n_sent: the sentences (one <p> each, first word <b>-wrapped)
      last line        : ``© 2024 Synth <Example>``     (footer, entities)
    Comments, style, script, noscript, template subtrees contribute
    nothing.
    """
    d = doc_id
    n_sent = 1 + d % 3
    sents = [_render_sentence(d, s)[0] for s in range(n_sent)]
    cat = TEMPLATES[(d * 7) % _T][1]

    paras = []
    for s, sent in enumerate(sents):
        w0, _, rest = sent.partition(" ")
        paras.append(f'<p id="s{s}"><b>{w0}</b> {rest}</p>')

    html = "\n".join(
        [
            "<!DOCTYPE html>",
            f"<!-- synthetic page {d} -->",
            "<html>",
            "<head>",
            '<meta charset="utf-8">',
            f"<title>Doc {d} &amp; the {cat} page</title>",
            _STYLE,
            _SCRIPT_TMPL % d,
            "</head>",
            "<body>",
            f'<nav><ul><li>Home</li><li><a href="/about?d={d}&amp;x=1">About</a></li></ul></nav>',
            f'<h1>Entry <span class="num">{d}</span></h1>',
            "<noscript>enable javascript</noscript>",
            *paras,
            "<template><p>hidden boilerplate</p></template>",
            f"<footer>{_FOOTER_HTML}</footer>",
            "</body>",
            "</html>",
            "",
        ]
    )
    lines = [
        f"Doc {d} & the {cat} page",
        "Home",
        "About",
        f"Entry {d}",
        *sents,
        _FOOTER_TEXT,
    ]
    # expected (tag, line) blocks — the provenance contract of
    # functions.htmltext.extract_blocks_py on this page shape
    blocks = list(
        zip(
            ["title", "li", "li", "h1"] + ["p"] * n_sent + ["footer"],
            lines,
        )
    )
    return {
        "doc_id": d,
        "url": f"https://synth.example/{cat}/{d:08d}",
        "lang": "en" if d % 20 != 0 else "xx",
        "html": html.encode("utf-8"),
        "text": "\n".join(lines),
        "blocks": blocks,
    }


RICH_PAGES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("lang", StringType()),
        StructField("html", BinaryType()),
    ]
)


def _pages_df(docs) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [render_rich_page_py(int(x)) for x in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r["doc_id"] for r in rows],
                    "url": [r["url"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                    "html": [r["html"] for r in rows],
                }
            )

    return docs.mapInPandas(gen, RICH_PAGES_SCHEMA)


def rich_pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, html) for every row of the driver's documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return _pages_df(docs)


def rich_pages_from_range(
    spark: SparkSession, n_docs: int, partitions: int | None = None
) -> DataFrame:
    """Scale-free bench source: n_docs rich pages from a pure id range."""
    par = partitions or spark.sparkContext.defaultParallelism
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id").repartition(par, "doc_id")
    return _pages_df(docs)


def _web_cte() -> str:
    """Shared WITH-body: gold_cte + per-sentence rendered text + doc
    category — everything both web oracles build on."""
    pat_rows = [(t, pat) for t, (_p, _c, _o, pat) in enumerate(TEMPLATES)]
    fill_rows = list(enumerate(FILLERS))
    return f"""{gold_cte(include_xx=True)},
pat(t, pattern) AS (VALUES
    {_values(pat_rows)}
),
fill(i, txt) AS (VALUES
    {_values(fill_rows)}
),
sent_txt AS (
  SELECT st.doc_id, st.s,
         CASE WHEN (st.doc_id*31 + st.s*17) % 10 = 0
              THEN f.txt || ' .'
              ELSE replace(replace(p.pattern,
                                   'ENTITIES_1 ', g.subj_surface || ' '),
                           'ENTITIES_2 ', g.obj_surface || ' ')
         END AS txt
  FROM sent st
  LEFT JOIN hit h ON h.doc_id = st.doc_id AND h.s = st.s
  LEFT JOIN pat p ON p.t = h.t
  LEFT JOIN gold g ON g.doc_id = st.doc_id AND g.sent_idx = st.s
  LEFT JOIN fill f ON f.i = (st.doc_id*13 + st.s) % {len(FILLERS)}
),
dcat AS (
  SELECT d.doc_id, tm.scat
  FROM documents d JOIN tmpl tm ON tm.t = (d.doc_id*7) % {_T}
)"""


def rich_text_sql() -> str:
    """Oracle: (doc_id, text, n_lines) — the FULL expected extracted text.

    Sentence bodies replay the reference relex semantics in SQL exactly
    as `fixtures.gold_triples_sql` does for triples: nested replace() in
    sorted slot-key order over the template pattern, surfaces from the
    gold CTE. Structural lines (title/nav/h1/footer) are concatenated
    literals; n_lines = 5 + n_sent is pure arithmetic.
    """
    nl = "chr(10)"
    footer = _FOOTER_TEXT.replace("'", "''")
    return f"""WITH {_web_cte()},
body AS (
  SELECT doc_id, string_agg(txt, {nl} ORDER BY s) AS sents
  FROM sent_txt GROUP BY doc_id
)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       'Doc ' || CAST(b.doc_id AS VARCHAR) || ' & the ' || c.scat || ' page'
         || {nl} || 'Home' || {nl} || 'About'
         || {nl} || 'Entry ' || CAST(b.doc_id AS VARCHAR)
         || {nl} || b.sents
         || {nl} || '{footer}' AS text,
       CAST(6 + b.doc_id % 3 AS BIGINT) AS n_lines
FROM body b JOIN dcat c ON c.doc_id = b.doc_id"""


def rich_blocks_sql() -> str:
    """Oracle: (doc_id, block_idx, tag, text) — expected tagged blocks.

    Pure structure arithmetic: idx 0 title, 1-2 nav li, 3 h1, 4..3+n_sent
    the <p> sentences, 4+n_sent footer.
    """
    footer = _FOOTER_TEXT.replace("'", "''")
    return f"""WITH {_web_cte()}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(block_idx AS BIGINT) AS block_idx, tag, text
FROM (
  SELECT c.doc_id, 0 AS block_idx, 'title' AS tag,
         'Doc ' || CAST(c.doc_id AS VARCHAR) || ' & the ' || c.scat || ' page' AS text
  FROM dcat c
  UNION ALL
  SELECT doc_id, 1, 'li', 'Home' FROM dcat
  UNION ALL
  SELECT doc_id, 2, 'li', 'About' FROM dcat
  UNION ALL
  SELECT doc_id, 3, 'h1', 'Entry ' || CAST(doc_id AS VARCHAR) FROM dcat
  UNION ALL
  SELECT doc_id, 4 + s, 'p', txt FROM sent_txt
  UNION ALL
  SELECT doc_id, 5 + doc_id % 3, 'footer', '{footer}' FROM dcat
)"""
