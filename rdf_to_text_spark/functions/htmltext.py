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
# "scan" drives _TextExtractor with the FUSED tame tokenizer below
# (equivalence-or-fallback, differential-tested) and re-runs the stdlib
# walk on any surprise; "full" pins the stdlib walk.
KERNEL = "scan"

# Start tags whose ATTRIBUTES the extractor reads (href / name+content)
# or whose parse has side machinery (skip-subtree gate, script/style
# CDATA jump): these go through the full tolerant attr parse. Block
# tags need only flush+stack (attrs ignored); every other tag
# (b/i/em/span/strong/code/...) is a handler no-op.
_NEEDS_ATTRS = _SKIP_TAGS | {"a", "meta"}
_INTERESTING_END = _SKIP_TAGS | _BLOCK_TAGS | {"a"}


def _fused_feed(p: _TextExtractor, s: str, low: str) -> None:
    """Fused tokenizer+extractor drive of ``p`` over ``s`` (the
    rich-extract kernel ceiling): identical final state to ``p.feed(s);
    p.close()`` on any input it completes (differential fuzz + corpus
    tests in tests/test_structscan.py), ``Untame`` on anything outside
    the tame subset (caller re-runs the stdlib walk).

    Versus the generic ``structscan.feed_events`` event mirror, this
    exploits what the HANDLER ignores, inlining the construct loop so
    each tag costs one locate + one name match and only the constructs
    that matter pay more:

      * block tags flush/push inline — their attributes are validated
        (same tolerant walk, same Untame junk condition as the stdlib
        mirror) but never materialized, unescaped, or dispatched;
      * inert inline tags validate and skip — no handler call;
      * inert end tags are a set-lookup no-op;
      * text runs append inline (per-run ``&`` unescape preserved — an
        entity can never span runs because runs are tag-delimited, and
        the stdlib never decodes an entity interrupted by a tag);
      * only ``a``/``meta``/skip-subtree tags take the full attribute
        parse, via the SAME mirror as the struct scanner
        (structscan._parse_starttag), so attribute semantics are
        identical by construction."""
    from html import unescape
    from html.parser import (
        attrfind_tolerant,
        locatestarttagend_tolerant,
        tagfind_tolerant,
    )

    from .structscan import (
        _CDATA_CLOSE,
        _ENDTAG_RE,
        _parse_markup_misc,
        Untame,
    )

    n = len(s)
    i = 0
    find = s.find
    blocks, voids, needs = _BLOCK_TAGS, _VOID_BLOCKS, _NEEDS_ATTRS
    while i < n:
        nxt = find("<", i)
        if nxt != i:
            chunk = s[i:] if nxt < 0 else s[i:nxt]
            # handle_data inlined: skipped subtrees drop data; anchors
            # accumulate their own run copy
            if not p._skip:
                if "&" in chunk:
                    chunk = unescape(chunk)
                p._parts.append(chunk)
                if p._a_href is not None:
                    p._a_parts.append(chunk)
            if nxt < 0:
                return
            i = nxt
        c = s[i + 1 : i + 2]
        if c and c.isalpha():
            lm = locatestarttagend_tolerant.match(s, i)
            e = lm.end()
            nxt2 = s[e : e + 1]
            if nxt2 == ">":
                tag_end = e + 1
                startend = False
            elif nxt2 == "/" and s[e : e + 2] == "/>":
                tag_end = e + 2
                startend = True
            else:
                raise Untame("junk between attributes and '>'")
            tm = tagfind_tolerant.match(s, i + 1)
            tag = tm.group(1).lower()
            if tag in needs:
                # full attr parse (a/meta read values; skip tags gate
                # subtrees + script/style CDATA) — the same tolerant
                # walk as structscan._parse_starttag, reusing the
                # locate/tagfind matches already in hand
                k = tm.end()
                attrs = []
                while k < e:
                    am = attrfind_tolerant.match(s, k)
                    if am is None:
                        break
                    attrname, rest, attrvalue = am.group(1, 2, 3)
                    if not rest:
                        attrvalue = None
                    elif (
                        attrvalue[:1] == "'" == attrvalue[-1:]
                        or attrvalue[:1] == '"' == attrvalue[-1:]
                    ):
                        attrvalue = attrvalue[1:-1]
                    if attrvalue:
                        attrvalue = unescape(attrvalue)
                    attrs.append((attrname.lower(), attrvalue))
                    k = am.end()
                if s[k:e].strip():
                    raise Untame("unparsed attribute junk")
                if startend:
                    p.handle_startendtag(tag, attrs)
                    i = tag_end
                    continue
                p.handle_starttag(tag, attrs)
                if tag in ("script", "style"):
                    # stdlib CDATA mode: raw content to the closer; an
                    # unclosed script buffers forever in the stdlib, so
                    # nothing is emitted — mirror by jumping to EOF
                    cm = _CDATA_CLOSE[tag].search(low, tag_end)
                    if cm is None:
                        return
                    p.handle_data(s[tag_end : cm.start()])
                    p.handle_endtag(tag)
                    i = cm.end()
                    continue
                i = tag_end
                continue
            k = tm.end()
            if k < e:
                # attr region present: validate it exactly as the
                # mirror does (junk → Untame) without materializing
                while k < e:
                    am = attrfind_tolerant.match(s, k)
                    if am is None:
                        break
                    k = am.end()
                if s[k:e].strip():
                    raise Untame("unparsed attribute junk")
            if tag in blocks and not p._skip:
                # handle_starttag/_startendtag inlined for blocks
                if p._parts:
                    line = " ".join("".join(p._parts).split())
                    if line:
                        p._blocks.append(
                            (p._stack[-1] if p._stack else None, line)
                        )
                    p._parts = []
                if not startend and tag not in voids:
                    p._stack.append(tag)
            i = tag_end
            continue
        if c == "/":
            em = _ENDTAG_RE.match(s, i)
            if em is None:
                raise Untame("malformed end tag")
            tag = em.group(1).lower()
            if tag in _INTERESTING_END:
                p.handle_endtag(tag)
            i = em.end()
            continue
        if c in ("!", "?"):
            i = _parse_markup_misc(p, s, low, i)
            continue
        # '<' + EOF or non-name char: plain data in the stdlib parser
        if not p._skip:
            p._parts.append("<")
            if p._a_href is not None:
                p._a_parts.append("<")
        i += 1


def _parse(html: bytes | str | None) -> _TextExtractor:
    parser = _TextExtractor()
    if html is None:
        return parser
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if KERNEL == "scan":
        from .structscan import _ASCII_LOWER

        try:
            _fused_feed(parser, html, html.translate(_ASCII_LOWER))
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
