"""Common-Crawl-grade HTML → text extraction (the `html:binary` column).

BASELINE.json's input_hint declares the engine's input as an Iceberg
table of web pages ``(url, warc_ts, html:binary, text, lang)``. The
fixture-grade extractor (`textnorm.extract_text_py`) only strips tags —
enough for the byte-identical flagship contract, but not for real
Common-Crawl payloads. This module is the production extractor:

  * ``<script>/<style>/<noscript>/<template>/<svg>`` subtrees dropped
    (nesting-safe via a skip counter; script/style content arrives as
    raw text and is gated the same way);
  * comments, doctype/declarations, and processing instructions dropped;
  * character references decoded (``&amp;`` → ``&``, ``&#169;`` → ``©``)
    via the stdlib tokenizer's ``convert_charrefs``;
  * block-level elements (``p/div/h1-h6/li/tr/...``) delimit lines;
    inline elements (``a/b/i/span/...``) do not;
  * within a line, whitespace runs collapse to single spaces;
    whitespace-only lines are dropped; lines join with ``\\n``.

Execution model: HTML tokenization is genuinely imperative (stateful
tokenizer, raw-text modes) — the same category as the PNG codec
(`operators/png.py`), so it runs as per-document Python inside
Arrow-batched stages (`pandas_udf`), never as a row-at-a-time Python
UDF in the plan. At 100 TB this stage is embarrassingly parallel
(narrow map over the page scan, zero shuffle), so throughput scales
with cores exactly like the flagship extraction (BENCH.md scaling
runs); the per-doc Python cost is the irreducible tokenizer cost every
CC pipeline pays (trafilatura/resiliparse are the same shape).

The extractor is deliberately lossless-structural, not a boilerplate
classifier: nav/footer text is kept (downstream quality scoring —
`operators/text_analysis.py` — is the place where boilerplate-heavy
docs get down-weighted, on extracted text, where the decision is
cheap and model-replaceable).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Subtrees whose text content is never part of the extracted text.
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "svg"})

# Elements that delimit lines. Everything else (a/b/i/em/strong/span/
# code/small/sup/sub/...) is inline: no break, word adjacency preserved.
_BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "br",
        "caption", "dd", "div", "dl", "dt", "fieldset", "figcaption",
        "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
        "head", "header", "hr", "html", "li", "main", "nav", "ol", "p",
        "pre", "section", "table", "tbody", "td", "tfoot", "th", "thead",
        "title", "tr", "ul",
    }
)


# Void/separator blocks: they break lines but never *contain* content,
# so they don't join the open-container stack used for provenance.
_VOID_BLOCKS = frozenset({"br", "hr"})


class _TextExtractor(HTMLParser):
    """Streaming tokenizer → (tagged lines, skip-gate) fold.

    ``convert_charrefs=True`` decodes entity/char references inside
    ordinary data (but not inside script/style raw text, which we skip
    anyway). The stdlib parser is lenient by construction — malformed
    markup (unclosed tags, stray ``<``, unknown entities) degrades to
    data or gets dropped, it never raises.

    Each emitted line carries the innermost block element open while its
    text accumulated (``p``/``li``/``h1``/``footer``/… or None at top
    level) — the provenance that downstream main-content selection keys
    on (boilerplate lives in nav/footer/li; prose lives in p).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._parts: list[str] = []
        self._blocks: list[tuple[str | None, str]] = []  # (container_tag, line)
        self._stack: list[str] = []
        self._links: list[tuple[str, str]] = []  # (href, anchor_text)
        self._a_href: str | None = None
        self._a_parts: list[str] = []
        self._metas: list[tuple[str, str]] = []  # (name, content)

    # -- tag structure -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif self._skip:
            # a block tag INSIDE a skipped subtree (<template><p>…) is
            # inert content, not a line break
            return
        elif tag == "a":
            # a new <a> implicitly closes a dangling one (invalid
            # nesting degrades the way browsers degrade it)
            self._flush_anchor()
            href = next((v for k, v in attrs if k == "href"), None)
            if href is not None:
                self._a_href = href
        elif tag == "meta":
            self._collect_meta(attrs)
        elif tag in _BLOCK_TAGS:
            self._flush_line()
            if tag not in _VOID_BLOCKS:
                self._stack.append(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            # max() keeps a stray </script> from opening the gate early
            self._skip = max(0, self._skip - 1)
        elif self._skip:
            return
        elif tag == "a":
            self._flush_anchor()
        elif tag in _BLOCK_TAGS:
            self._flush_line()
            # lenient unwind: pop to the matching open tag if present
            if tag in self._stack:
                while self._stack and self._stack.pop() != tag:
                    pass

    # <br/> / <hr/> arrive here; default impl would call start+end, which
    # for skip tags would inc+dec (no-op) — make the block break explicit.
    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._skip:
            return
        if tag == "meta":  # XHTML-style <meta … />
            self._collect_meta(attrs)
        elif tag in _BLOCK_TAGS:
            self._flush_line()

    def _collect_meta(self, attrs) -> None:
        kv = {k: v for k, v in attrs}
        name, content = kv.get("name"), kv.get("content")
        if name is not None and content is not None:
            self._metas.append((name, content))

    # -- content -------------------------------------------------------
    def handle_data(self, data: str) -> None:
        if not self._skip and data:
            self._parts.append(data)
            if self._a_href is not None:
                self._a_parts.append(data)

    # comments / doctype / PIs: intentionally dropped (default no-ops).

    # -- assembly ------------------------------------------------------
    def _flush_line(self) -> None:
        if self._parts:
            line = " ".join("".join(self._parts).split())
            if line:
                self._blocks.append((self._stack[-1] if self._stack else None, line))
            self._parts = []

    def _flush_anchor(self) -> None:
        if self._a_href is not None:
            self._links.append(
                (self._a_href, " ".join("".join(self._a_parts).split()))
            )
        self._a_href = None
        self._a_parts = []

    def text(self) -> str:
        self._flush_line()
        return "\n".join(line for _tag, line in self._blocks)

    def blocks(self) -> list[tuple[str | None, str]]:
        self._flush_line()
        return list(self._blocks)

    def links(self) -> list[tuple[str, str]]:
        self._flush_anchor()  # a dangling <a> still yields its href
        return list(self._links)

    def metas(self) -> list[tuple[str, str]]:
        return list(self._metas)


def extract_text_rich_py(html: bytes | str | None) -> str:
    """bytes/str HTML → newline-separated visible text (spec above).

    The try/except inside :func:`_parse` is belt-and-braces: HTMLParser
    is documented lenient, so a pathological payload yields its partial
    text, not a task error.
    """
    return _parse(html).text()


# Kernel selector, same contract as functions/structparse.KERNEL:
# "scan" drives _TextExtractor with structscan.feed_events (the tame
# event tokenizer — equivalence-or-fallback, differential-tested) and
# re-runs the stdlib walk on any surprise; "full" pins the stdlib walk.
KERNEL = "scan"


def _parse(html: bytes | str | None) -> _TextExtractor:
    parser = _TextExtractor()
    if html is None:
        return parser
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if KERNEL == "scan":
        from . import structscan

        try:
            structscan.feed_events(parser, html)
            return parser
        except Exception:
            parser = _TextExtractor()  # Untame/surprise: stdlib decides
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    return parser


def extract_links_py(html: bytes | str | None) -> list[tuple[str, str]]:
    """HTML → ordered [(href, anchor_text)] for every ``<a href=…>``.

    Entity references in both href and anchor are decoded (the
    tokenizer decodes attribute charrefs unconditionally). Anchors in
    skipped subtrees are ignored; an ``<a>`` without href contributes
    nothing; a dangling anchor still yields its href with whatever text
    accumulated. The web-graph front half: downstream
    `operators/webtext.py:html_links` resolves these against the page
    url into absolute link targets.
    """
    return _parse(html).links()


def extract_meta_py(html: bytes | str | None) -> list[tuple[str, str]]:
    """HTML → ordered [(name, content)] for every ``<meta name content>``.

    The page-directive surface a crawl pipeline gates on: robots
    noindex/nofollow, description, generator, … Metas lacking either
    attribute (e.g. ``<meta charset>``) contribute nothing; values have
    charrefs decoded by the tokenizer.
    """
    return _parse(html).metas()


def parse_all_py(html: bytes | str | None) -> dict:
    """ONE tokenizer pass → every view: text, blocks, links, metas.

    The 100 TB contract: the corpus is tokenized exactly once. The
    separate extract_*_py functions exist for single-view callers and
    tests; production page profiling goes through here (see
    operators/webtext.py:parse_pages).
    """
    p = _parse(html)
    return {
        "text": p.text(),
        "blocks": p.blocks(),
        "links": p.links(),
        "metas": p.metas(),
    }


def extract_blocks_py(html: bytes | str | None) -> list[tuple[str | None, str]]:
    """HTML → ordered [(container_tag, line)] — text + block provenance.

    Same extraction spec as :func:`extract_text_rich_py` (joining the
    line column reproduces its output exactly), plus the innermost
    block element that produced each line. Main-content selection —
    'keep paragraph prose, drop nav/footer chrome' — is then a plain
    filter on the tag column, which is how the production pipeline
    feeds CLEAN text to triple extraction without a boilerplate model.
    """
    return _parse(html).blocks()


def _extract_series(html: pd.Series) -> pd.Series:
    return html.map(extract_text_rich_py)


@pandas_udf(StringType())
def extract_rich_udf(html: pd.Series) -> pd.Series:
    """binary html → extracted text, Arrow-batched (no per-row plan UDF)."""
    return _extract_series(html)
