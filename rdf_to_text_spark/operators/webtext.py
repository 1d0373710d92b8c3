"""Web-page operators: tagged block extraction + rich-HTML triple path.

This is the production front end the north_rule describes — real
Common-Crawl-style pages in, canonical triples out:

  pages(html:binary) ──► blocks (tag-tagged lines)          [html_blocks]
                     ──► main-content text (tag filter)
                     ──► normalize ──► template extraction
                                          [extract_triples_from_rich_html]

Scale shape: both operators are narrow Arrow-batched map stages over the
page scan — ZERO shuffle, identical to the flagship extraction
(`operators/extract.py`), so the BENCH.md scaling runs transfer: the
only cost added per page is the stdlib HTML tokenizer (the irreducible
cost every CC extraction pipeline pays; cf. trafilatura/resiliparse).
The `lang = 'en'` gate stays ahead of all Python work and pushes down
to the parquet/Iceberg scan.

Main-content selection is a *tag filter*, not a model: prose lives in
``<p>`` blocks, chrome in title/nav/li/footer. That keeps content
choice declarative (a column predicate users can change per corpus) and
— crucially for the extraction contract — keeps the anchored template
regexes (`extract.py:PatternBank`) away from boilerplate tokens that
would otherwise pollute slot captures.

Reference parity: downstream of text assembly this path is byte-for-byte
the flagship chain (`webnlg_baseline_input.py:68-97` inversion) — the
rich query in queries_catalog is checked against the SAME
`gold_triples_sql` oracle as `kg_extract_triples`.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.htmltext import extract_blocks_py, extract_links_py
from ..functions.textnorm import _normalize_series
from .extract import TRIPLES_SCHEMA, _extract_batch

BLOCKS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("block_idx", LongType()),
        StructField("tag", StringType()),
        StructField("text", StringType()),
    ]
)


def _exploded(pages: DataFrame, in_cols: list, schema: StructType, per_doc):
    """Shared in-batch-explode stage for the per-page extractors.

    One narrow mapInPandas over `in_cols`; `per_doc(*row)` yields output
    tuples in schema order. The explode happens inside the Arrow batch
    (plain list accumulation), so no Spark-side explode/shuffle, and
    rows keep document order via the index columns each extractor emits.
    """
    names = [f.name for f in schema.fields]
    dtypes = {
        f.name: ("int64" if isinstance(f.dataType, LongType) else "object")
        for f in schema.fields
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n in names}
            for row in zip(*(pdf[c] for c in in_cols)):
                for out in per_doc(*row):
                    for n, v in zip(names, out):
                        cols[n].append(v)
            yield pd.DataFrame(
                {n: pd.Series(cols[n], dtype=dtypes[n]) for n in names}
            )

    return pages.select(*in_cols).mapInPandas(run, schema)


def html_blocks(pages: DataFrame) -> DataFrame:
    """pages(doc_id, html) → exploded (doc_id, block_idx, tag, text)."""

    def per_doc(doc_id, html):
        for i, (tag, line) in enumerate(extract_blocks_py(html)):
            yield int(doc_id), i, tag, line

    return _exploded(pages, ["doc_id", "html"], BLOCKS_SCHEMA, per_doc)


def extract_triples_from_rich_html(
    pages: DataFrame, content_tags: Sequence[str] = ("p",)
) -> DataFrame:
    """pages(doc_id, url, lang, html) → linked triples, fused one stage.

    decode → block extraction → main-content tag filter → join lines →
    byte-identical normalization → vectorized template extraction, all
    inside a single Arrow boundary (the `extract_triples_from_html`
    fusion argument: one Python worker per task, one Arrow round trip).
    """
    keep = frozenset(content_tags)
    gated = pages.filter(F.col("lang") == "en")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [
                " ".join(
                    line
                    for tag, line in extract_blocks_py(html)
                    if tag in keep
                )
                for html in pdf["html"]
            ]
            # .to_numpy(): texts has a fresh RangeIndex — never rely on
            # index alignment against the incoming batch frame
            batch = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "url": pdf["url"].to_numpy(),
                    "text": _normalize_series(
                        pd.Series(texts, dtype="object")
                    ).to_numpy(),
                }
            )
            yield _extract_batch(batch, "text")

    return gated.select("doc_id", "url", "html").mapInPandas(run, TRIPLES_SCHEMA)


LINKS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("link_idx", LongType()),
        StructField("href", StringType()),
        StructField("resolved", StringType()),
        StructField("anchor", StringType()),
    ]
)


def html_links(pages: DataFrame) -> DataFrame:
    """pages(doc_id, url, html) → (doc_id, link_idx, href, resolved, anchor).

    The web-graph front half: every ``<a href>`` with its anchor text
    and its ABSOLUTE target — hrefs resolved against the page url with
    urllib.parse.urljoin (real RFC 3986 relative-reference resolution,
    not string concat). Same zero-shuffle Arrow-batched shape as
    html_blocks; the explode stays inside the batch.
    """
    from urllib.parse import urljoin

    def per_doc(doc_id, url, html):
        for i, (href, anchor) in enumerate(extract_links_py(html)):
            yield int(doc_id), i, href, urljoin(url or "", href), anchor

    return _exploded(pages, ["doc_id", "url", "html"], LINKS_SCHEMA, per_doc)


# Absolute link targets that follow the corpus url scheme resolve to an
# in-corpus doc_id; everything else is an out-of-crawl edge endpoint.
# \d{8,}: the url renderer pads to a MINIMUM of 8 digits, so doc ids
# >= 10^8 produce longer runs — an anchored {8} would silently drop them
_CORPUS_URL_RX = r"^https://synth\.example/[A-Za-z]+/(\d{8,})$"


def link_edges(pages: DataFrame, docs: DataFrame) -> DataFrame:
    """In-corpus link-graph edges (src, dst): resolved targets that
    parse under the corpus url scheme AND exist in `docs` (links beyond
    the crawl are dropped, as in any web-graph build). One hash join of
    the exploded links against doc ids on the target key."""
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    links = html_links(pages)
    dst_str = F.regexp_extract("resolved", _CORPUS_URL_RX, 1)
    return (
        links.withColumn("dst", F.nullif(dst_str, F.lit("")).cast("long"))
        .filter(F.col("dst").isNotNull())
        .select(F.col("doc_id").alias("src"), "dst")
        .join(ids.withColumnRenamed("doc_id", "dst"), "dst")
    )


def link_degrees(
    pages: DataFrame, docs: DataFrame, cleanup: list | None = None
) -> DataFrame:
    """In-corpus link-graph degrees: (doc_id, out_links, in_links).

    Scale shape: the link explode is the narrow html_links stage; then
    the edges⋈ids hash join and two partial-aggregated groupBys — the
    canonical web-graph degree plan (shuffles on doc_id only,
    combiner-friendly counts, no skew beyond the graph's own in-degree
    distribution, which AQE skew-split absorbs at scale). The edge
    frame is persisted (handle → `cleanup`, house contract): the two
    differently-keyed aggregations would otherwise each re-run the
    dominant HTML-tokenize stage.
    """
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    edges = link_edges(pages, docs).persist()
    if cleanup is not None:
        cleanup.append(edges)
    outd = edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.count("*").alias("out_links")
    )
    ind = edges.groupBy(F.col("dst").alias("doc_id")).agg(
        F.count("*").alias("in_links")
    )
    return (
        ids.join(outd, "doc_id", "left")
        .join(ind, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("out_links", F.lit(0)).cast("long").alias("out_links"),
            F.coalesce("in_links", F.lit(0)).cast("long").alias("in_links"),
        )
    )


def url_normalized(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Adds `out_col` = RFC 3986-normalized spelling of `url_col`
    (functions/urlnorm.py — case, escapes, dot segments, default port,
    fragment). Run this BEFORE any url-keyed stage (latest_snapshot,
    link_edges, frontier dedup): canonicalizing after the shuffle means
    the shuffle key was wrong.

    Scale shape: one Arrow-batched pandas_udf projection — narrow, zero
    shuffle, pipelines into the scan like the other web maps."""
    from pyspark.sql.types import StringType

    from ..functions.urlnorm import normalize_url_py

    @F.pandas_udf(StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(normalize_url_py, na_action="ignore")

    return df.withColumn(out_col, _norm(F.col(url_col)))


def anchor_text_agg(pages: DataFrame, docs: DataFrame) -> DataFrame:
    """Anchor-text aggregation: (doc_id, anchor, n_refs, n_srcs) for
    every in-corpus link target — each distinct anchor string pointing
    at a page, with total reference count and distinct referring-page
    count.

    The classic KG-construction signal: the web's own names for an
    entity/page are the anchor texts of its in-links (the surface-form
    dictionary delexicalisation consumes starts exactly here; reference
    delexicalisation seeds from entity surfaces the same way,
    `benchmark_reader.py` entity maps). Self-references are kept — a
    page's self-anchor is still a name for it.

    Scale shape: the narrow html_links explode → one hash join against
    doc ids on the target key → ONE groupBy (dst, anchor) computing
    count + countDistinct(src). count is combiner-friendly;
    countDistinct expands to a two-phase exact aggregate — at web scale
    swap in approx_count_distinct if ±2% is acceptable (documented
    knob, not the default: the oracle pins the exact form).
    """
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    links = html_links(pages)
    dst_str = F.regexp_extract("resolved", _CORPUS_URL_RX, 1)
    return (
        links.withColumn("dst", F.nullif(dst_str, F.lit("")).cast("long"))
        .filter(F.col("dst").isNotNull())
        .select(F.col("doc_id").alias("src"), "dst", "anchor")
        .join(ids.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(F.col("dst").alias("doc_id"), "anchor")
        .agg(
            F.count("*").cast("long").alias("n_refs"),
            F.countDistinct("src").cast("long").alias("n_srcs"),
        )
    )


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    total: int = 10**12,
    cleanup: list | None = None,
) -> DataFrame:
    """Deterministic INTEGER PageRank: (doc_id, rank) after `iters` rounds.

    Classic float PageRank cannot sit under an exact cross-engine hash
    gate (sum association order differs between engines), so the mass
    is integer: every node starts with ``total`` units; each round a
    node keeps a constant teleport base ``total*15//100`` and each
    out-edge carries ``(rank*85//100) // out_deg`` units (floor
    division twice — the exact spec both engines replay). Dangling
    nodes' damped mass leaves the system (standard simplification;
    documented, identical on both sides). With total=10^12 the floor
    truncation error per round is ≤ out_deg units ≈ 10^-10 relative —
    numerically PageRank, arithmetically exact.

    Scale shape: the canonical iterative-join plan — per round ONE
    ranks⋈edges hash join (edges pre-joined with out-degrees, persisted
    across rounds; persist handle appended to `cleanup`, the house
    contract of ranking.py/dedup.py) and one combiner-friendly groupBy
    on dst. Rounds are data-independent constant count (no convergence
    probe), so the job is `iters` × (join + agg) shuffles on doc_id.
    In-degree skew (the web's power law) is AQE skew-split territory,
    same as link_degrees.
    """
    ids = nodes.select(F.col("doc_id").cast("long").alias("doc_id"))
    # persist the raw edges FIRST: deg and the deg-join below would each
    # re-execute the upstream extraction lineage otherwise
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e = edges.join(deg, "src").persist()
    if cleanup is not None:
        cleanup.extend([edges, e])
    base = total * 15 // 100
    ranks = ids.withColumn("rank", F.lit(total).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .select(
                F.col("dst").alias("doc_id"),
                F.expr("rank * 85 div 100 div deg").alias("send"),
            )
        )
        recv = contrib.groupBy("doc_id").agg(F.sum("send").alias("recv"))
        ranks = ids.join(recv, "doc_id", "left").select(
            "doc_id",
            (F.lit(base) + F.coalesce("recv", F.lit(0))).cast("long").alias("rank"),
        )
    return ranks


def pagerank_int_converged(
    edges: DataFrame,
    nodes: DataFrame,
    tol: int,
    max_iters: int = 12,
    total: int = 10**12,
    cleanup: list | None = None,
) -> DataFrame:
    """Web-scale integer PageRank: (doc_id, rank, n_rounds) with
    DANGLING-MASS REDISTRIBUTION and an L1 CONVERGENCE PROBE — the two
    simplifications :func:`pagerank_int` documents away, closed.

    Spec (exact, both engines replay it):
      * each round, every dangling node's damped mass ``rank*85//100``
        is summed and redistributed equally: every node receives
        ``dangling_sum // n_nodes`` (floor; the < n_nodes remainder is
        the only mass that leaves — ≤ 5e-10 relative at total=10^12);
      * rounds stop when the L1 delta ``sum(|rank - prev|)`` falls to
        ``tol`` or below, else at ``max_iters``; the stop round is
        returned as ``n_rounds`` so a hash gate pins WHERE the probe
        stopped, not only the final ranks.

    Scale shape: per round ONE ranks⋈edges join + one combiner-friendly
    groupBy (as pagerank_int), plus ONE fused scalar agg that collects
    (L1 delta of this round, dangling damped sum for the NEXT round) in
    a single driver round trip — the convergence probe every iterative
    engine pays, paid once per round, not twice. LINEAGE IS CUT, not
    just cached: `persist` caches data but every round's LOGICAL plan
    still nests the previous round's (and, at the leaves, the whole
    HTML-extraction lineage), so Catalyst re-optimization cost grows
    with round count — measured as a >9 min runaway at 12 rounds on the
    sf0.1 corpus, vs seconds with `localCheckpoint(eager=True)` on the
    degree-joined edges once and on the ranks each round (the same
    idiom the CC star loop uses, canonicalize.py:229,249; GraphX's
    Pregel checkpoints on the same schedule for the same reason).
    pagerank_int's fixed-3 unrolling doesn't need this; a probed loop
    does.
    """
    # the node-id frame is round-invariant but joined EVERY round: left
    # unchecked, each round re-executes the nodes scan (plus any layout
    # exchange upstream) — checkpoint it once and count off the
    # materialized blocks (r8; measured ~0.15-0.2 s/round at sf0.1)
    ids = (
        nodes.select(F.col("doc_id").cast("long").alias("doc_id"))
        .localCheckpoint(eager=True)
    )
    n_nodes = ids.count()
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # cut the upstream (HTML tokenize -> link resolve) lineage out of
    # every round's plan; this is the frame each round re-joins
    e = edges.join(deg, "src").localCheckpoint(eager=True)
    base = total * 15 // 100
    # has_out is likewise round-invariant; without the checkpoint its
    # distinct re-shuffles the checkpointed edge frame every round
    has_out = (
        e.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("has_out", F.lit(1))
        .localCheckpoint(eager=True)
    )
    if cleanup is not None:
        cleanup.extend([edges, e, ids, has_out])
    ranks = ids.withColumn("rank", F.lit(total).cast("long")).localCheckpoint(
        eager=True
    )
    # round-1 dangling sum: every node holds `total`, so it is exact
    # arithmetic, no job needed
    dangling = (n_nodes - deg.count()) * (total * 85 // 100)
    rounds = 0
    for _ in range(max_iters):
        share = dangling // n_nodes
        contrib = e.join(ranks.withColumnRenamed("doc_id", "src"), "src").select(
            F.col("dst").alias("doc_id"),
            F.expr("rank * 85 div 100 div deg").alias("send"),
        )
        recv = contrib.groupBy("doc_id").agg(F.sum("send").alias("recv"))
        # The prev-rank and has_out joins ride the SAME materialization
        # job as the checkpoint (r8): the probe then aggregates the flat
        # checkpointed frame with no join — one fewer join job per
        # round than the old checkpoint-then-probe-join split.
        wide = (
            ids.join(recv, "doc_id", "left")
            .select(
                "doc_id",
                (F.lit(base + share) + F.coalesce("recv", F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            .join(ranks.withColumnRenamed("rank", "_prev"), "doc_id")
            .join(has_out, "doc_id", "left")
            .select(
                "doc_id",
                "rank",
                F.abs(F.col("rank") - F.col("_prev")).alias("_d"),
                F.when(
                    F.col("has_out").isNull(), F.expr("rank * 85 div 100")
                ).alias("_g"),
            )
            # eager checkpoint = materialize + cut lineage in one job
            .localCheckpoint(eager=True)
        )
        # probe: this round's L1 delta + next round's dangling sum, one
        # scalar agg over the checkpointed blocks
        delta, dang_next = (
            wide.agg(F.sum("_d").alias("delta"), F.sum("_g").alias("dang"))
            .collect()[0]
        )
        dangling = dang_next or 0
        ranks.unpersist()
        ranks = wide.select("doc_id", "rank")
        rounds += 1
        if delta <= tol:
            break
    if cleanup is not None:
        cleanup.append(ranks)
    return ranks.withColumn("n_rounds", F.lit(rounds).cast("int"))


META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("meta_idx", LongType()),
        StructField("name", StringType()),
        StructField("content", StringType()),
    ]
)


def html_meta(pages: DataFrame) -> DataFrame:
    """pages(doc_id, html) → (doc_id, meta_idx, name, content).

    The crawl-gating directive surface: robots noindex/nofollow,
    description, generator, … A noindex filter is then a plain anti
    join / NOT EXISTS on this frame — declarative, so Catalyst pushes
    it wherever it helps. Same in-batch-explode shape as html_blocks.
    """
    from ..functions.htmltext import extract_meta_py

    def per_doc(doc_id, html):
        for i, (name, content) in enumerate(extract_meta_py(html)):
            yield int(doc_id), i, name, content

    return _exploded(pages, ["doc_id", "html"], META_SCHEMA, per_doc)


def _struct(**fields) -> StructType:
    return StructType([StructField(k, v) for k, v in fields.items()])


PARSED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("text", StringType()),
        StructField(
            "blocks", ArrayType(_struct(tag=StringType(), text=StringType()))
        ),
        StructField(
            "links",
            ArrayType(
                _struct(
                    href=StringType(), resolved=StringType(), anchor=StringType()
                )
            ),
        ),
        StructField(
            "metas", ArrayType(_struct(name=StringType(), content=StringType()))
        ),
    ]
)


def parse_pages(pages: DataFrame) -> DataFrame:
    """Parse-once page profiling: ONE tokenizer pass per page → every
    view as nested columns (text, tagged blocks, resolved links, meta
    directives).

    This is the production shape at 100 TB: the corpus is tokenized
    exactly once, then each downstream consumer (main-content filter,
    link-graph build, directive gating, quality scoring) is a
    projection/explode of the parsed frame — Catalyst prunes the nested
    fields a consumer doesn't touch, and nothing re-pays the parse.
    The single-view operators (html_blocks/html_links/html_meta) remain
    for callers that want exactly one view without nested types.
    """
    from urllib.parse import urljoin

    from ..functions.htmltext import parse_all_py

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {n: [] for n in ("doc_id", "url", "text", "blocks", "links", "metas")}
            for doc_id, url, html in zip(pdf["doc_id"], pdf["url"], pdf["html"]):
                views = parse_all_py(html)
                rows["doc_id"].append(int(doc_id))
                rows["url"].append(url)
                rows["text"].append(views["text"])
                rows["blocks"].append(
                    [{"tag": t, "text": x} for t, x in views["blocks"]]
                )
                rows["links"].append(
                    [
                        {"href": h, "resolved": urljoin(url or "", h), "anchor": a}
                        for h, a in views["links"]
                    ]
                )
                rows["metas"].append(
                    [{"name": n, "content": c} for n, c in views["metas"]]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "url": pd.Series(rows["url"], dtype="object"),
                    "text": pd.Series(rows["text"], dtype="object"),
                    "blocks": pd.Series(rows["blocks"], dtype="object"),
                    "links": pd.Series(rows["links"], dtype="object"),
                    "metas": pd.Series(rows["metas"], dtype="object"),
                }
            )

    return pages.select("doc_id", "url", "html").mapInPandas(run, PARSED_SCHEMA)


def latest_snapshot(
    pages: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    tiebreak_col: str | None = "html",
) -> DataFrame:
    """Crawl snapshot compaction: keep the LATEST capture per `key`.

    The CDX dedup every multi-crawl corpus needs before processing —
    re-crawled urls appear once per crawl; downstream wants one row per
    page. One shuffle on the key (window partition), ordered ts desc.
    Capture timestamps within one crawl are strictly increasing per
    url, but ACROSS crawls same-second captures happen; `tiebreak_col`
    (default the html payload) is hashed into a deterministic second
    sort key so the kept row never depends on shuffle arrival order.
    Pass ``tiebreak_col=None`` to opt out (callers whose ts is already
    total). Adds `n_versions` (captures seen for the key), which
    freshness/quality scoring consumes downstream.

    Scale: partitionBy(key) is the canonical compaction shuffle;
    per-url capture counts are tiny (single digits), so no skew beyond
    hot hosts — and the key is the full url, not the host. The
    tiebreak hash is a narrow projection, no extra shuffle.
    """
    from pyspark.sql import Window

    order = [F.col(ts).desc()]
    if tiebreak_col is not None and tiebreak_col in pages.columns:
        order.append(F.xxhash64(tiebreak_col).desc())
    w = Window.partitionBy(key).orderBy(*order)
    wc = Window.partitionBy(key)
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(wc).cast("long"))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def crawl_frontier(
    edges: DataFrame, seeds: DataFrame, max_depth: int = 3
) -> DataFrame:
    """Frontier expansion over the link graph: (doc_id, depth) — the
    minimum hop count from any seed, bounded by ``max_depth`` (the
    crawl-scheduling primitive: which urls does generation k+1 fetch).

    Per round: frontier⋈edges hash join on src + distinct + anti join
    against the visited set — the standard distributed BFS plan. The
    frontier and visited frames are localCheckpoint(eager)ed each round
    (the CC/PageRank lineage-cut idiom: without it Catalyst re-optimizes
    a round-over-round nested plan). Rounds are bounded by ``max_depth``,
    not data size; an exhausted frontier short-circuits. At web scale
    the visited set is the accumulating term — it stays (doc_id, depth)
    only, and the anti join shuffles ids, never page payloads.
    """
    frontier = (
        seeds.select(F.col("doc_id").cast("long").alias("doc_id"))
        .distinct()
        .withColumn("depth", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    visited = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            # no broadcast hint: a seed round is tiny but mid-BFS
            # frontiers can be graph-sized — AQE picks broadcast when
            # the materialized (checkpointed) frontier is actually small
            edges.join(frontier.select(F.col("doc_id").alias("src")), "src")
            .select(F.col("dst").alias("doc_id"))
            .distinct()
            .join(visited.select("doc_id"), "doc_id", "left_anti")
            .withColumn("depth", F.lit(depth).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def hits_int(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 2,
    cleanup: list | None = None,
) -> DataFrame:
    """Deterministic INTEGER HITS: (doc_id, hub, auth) after ``iters``
    rounds of the unnormalized update (h₀ = 1; aᵢ(v) = Σ_{u→v} hᵢ₋₁(u);
    hᵢ(u) = Σ_{u→v} aᵢ(v)).

    Kleinberg's normalization divides by the L2 norm each round — a
    float no cross-engine hash can pin — so, like pagerank_int, the
    engine runs the exact integer recurrence and leaves scaling to the
    caller (rankings are norm-invariant). Values grow ≤ (max_deg)²ⁱ·n,
    far inside BIGINT for real out-degree caps at small iters; callers
    needing many rounds rescale between rounds (documented envelope).

    Scale shape: per round two edge⋈score hash joins + two
    combiner-friendly groupBys on doc_id — the same iterative-join
    skeleton as pagerank_int, edges persisted once (`cleanup` house
    contract).
    """
    if iters < 1:
        raise ValueError(f"hits_int requires iters >= 1, got {iters}")
    ids = nodes.select(F.col("doc_id").cast("long").alias("doc_id"))
    edges = edges.persist()
    if cleanup is not None:
        cleanup.append(edges)
    hub = ids.withColumn("hub", F.lit(1).cast("long"))
    auth = None
    for _ in range(iters):
        a_recv = (
            edges.join(hub.withColumnRenamed("doc_id", "src"), "src")
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("hub").alias("recv"))
        )
        auth = ids.join(a_recv, "doc_id", "left").select(
            "doc_id", F.coalesce("recv", F.lit(0)).cast("long").alias("auth")
        )
        h_recv = (
            edges.join(auth.withColumnRenamed("doc_id", "dst"), "dst")
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.sum("auth").alias("recv"))
        )
        hub = ids.join(h_recv, "doc_id", "left").select(
            "doc_id", F.coalesce("recv", F.lit(0)).cast("long").alias("hub")
        )
    return hub.join(auth, "doc_id")


def resolve_redirect_chains(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Resolve HTTP-redirect / rel=canonical CHAINS to their terminal:
    (src, final, n_hops) for every source in a functional edge set
    (each src has exactly one dst; a url absent from the src column is
    a terminal). The primitive behind canonical-url consolidation in a
    crawl index — every near-dup/linking stage keys on the TERMINAL
    url, not the hop-1 target.

    Plan: POINTER DOUBLING, not hop-at-a-time walking — round k jumps
    every pointer up to 2^k hops (ptr ⋈ ptr on dst=src; hops add), so
    a chain of length L resolves in ⌈log2 L⌉ self-joins instead of L
    sequential ones. Each round is one shuffle on the pointer table +
    one scalar convergence probe, with `localCheckpoint(eager=True)`
    cutting the squared-lineage replan cost (the pagerank_int_converged
    idiom above). At 100 TB a redirect chain is rarely >30 hops: 5
    rounds, each a co-partitioned self-join AQE can plan — vs 30
    full-table joins for the naive walk.

    Cycles never converge under doubling (the pointer orbits).
    Convergence requires one final round observing zero moves, so
    chains up to 2^(max_iters-1) hops are guaranteed to resolve; after
    `max_iters` rounds a sample of the still-moving srcs is included in
    the raised error rather than looping forever.
    """
    ptr = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.lit(1).cast("long").alias("n_hops"),
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        jumped = (
            ptr.alias("a")
            .join(
                ptr.select(
                    F.col("src").alias("j_src"),
                    F.col("dst").alias("j_dst"),
                    F.col("n_hops").alias("j_hops"),
                ),
                F.col("a.dst") == F.col("j_src"),
                "left",
            )
            .select(
                F.col("a.src").alias("src"),
                F.coalesce("j_dst", "a.dst").alias("dst"),
                (F.col("a.n_hops") + F.coalesce("j_hops", F.lit(0))).alias("n_hops"),
                F.col("j_src").isNotNull().alias("moved"),
            )
            .localCheckpoint(eager=True)
        )
        ptr.unpersist()
        moved = jumped.agg(F.sum(F.col("moved").cast("int"))).collect()[0][0] or 0
        ptr = jumped.drop("moved")
        if moved == 0:
            return ptr.select("src", F.col("dst").alias("final"), "n_hops")
    # error path only: name a few of the srcs whose pointers still moved
    # in the last round (dst still appears as a src => unresolved).
    sample = [
        r["src"]
        for r in ptr.join(
            ptr.select(F.col("src").alias("_s")), F.col("dst") == F.col("_s"), "semi"
        )
        .select("src")
        .limit(5)
        .collect()
    ]
    raise ValueError(
        f"redirect chains unresolved after {max_iters} doubling rounds "
        f"(chains longer than 2^{max_iters - 1}, or a redirect cycle); "
        f"sample unresolved srcs: {sample}"
    )


def allocate_crawl_budget(
    hosts: DataFrame,
    budget: int,
    host_col: str = "host",
    weight_col: str = "n_pages",
    cleanup: list | None = None,
) -> DataFrame:
    """(host, quota) — split an integer crawl budget across hosts
    proportionally to `weight_col` with largest-remainder (Hamilton)
    apportionment: base_i = floor(budget * w_i / W), and the
    budget - sum(base) leftover units go to the hosts with the largest
    remainders (budget * w_i) mod W, ties broken by md5(host) (W2,
    collation-free). Exact integers throughout, sum(quota) == budget by
    construction — the crawl-frontier counterpart of the shard packer:
    a scheduler feeds each host's fetch queue its quota per cycle.

    Scale shape: one groupBy-free pass over the host table (already
    aggregated, one row per host), two dictionary-sized scalar probes
    (total weight, allocated base sum), and the remainder ranking via
    functions/ranking.py:global_row_numbers — hybrid: a host table at
    web scale (10^8 rows) takes the range-partitioned bucket path, no
    SinglePartition exchange; `cleanup` receives its persist handle.

    Domain: budget * max(w) must stay inside int64 (documented bound;
    both the engine and any SQL replay overflow together otherwise).
    """
    # budget is interpolated into F.expr arithmetic below: accept only a
    # true int (bool is an int subclass but changes semantics; anything
    # else would alter the expression text) so the f-string stays pure
    # integer arithmetic.
    if not isinstance(budget, int) or isinstance(budget, bool):
        raise TypeError(f"budget must be an int (got {type(budget).__name__})")
    if budget < 0:
        raise ValueError(f"budget must be >= 0 (got {budget})")
    from ..functions.ranking import global_row_numbers

    h = hosts.select(
        F.col(host_col).alias("host"),
        F.col(weight_col).cast("long").alias("w"),
    )
    total = h.agg(F.coalesce(F.sum("w"), F.lit(0)).cast("long")).collect()[0][0]
    if total <= 0:
        raise ValueError("total weight must be positive to apportion a budget")
    q = h.select(
        "host",
        "w",
        F.expr(f"({budget} * w) div {total}").alias("base"),
        F.expr(f"({budget} * w) % {total}").alias("rem"),
    )
    allocated = q.agg(F.coalesce(F.sum("base"), F.lit(0)).cast("long")).collect()[0][0]
    leftover = budget - allocated
    ranked = global_row_numbers(
        q,
        [F.col("rem").desc(), F.md5("host")],
        rn_col="_rn",
        cleanup=cleanup,
    )
    return ranked.select(
        "host",
        (F.col("base") + F.when(F.col("_rn") <= F.lit(leftover), 1).otherwise(0))
        .cast("long")
        .alias("quota"),
    )
