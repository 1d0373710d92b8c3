"""WARC source: Common-Crawl's container format, pure stdlib.

BASELINE.json frames the input as "Common-Crawl-style web pages"; the
format those actually arrive in is WARC (ISO 28500): a sequence of
records, each ``WARC/1.0`` + CRLF header lines + CRLF CRLF + a
Content-Length-delimited payload + CRLF CRLF. For ``response`` records
the payload is an HTTP response whose body is the page; Common Crawl
ships each record as its own gzip member, concatenated into ``.warc.gz``
files (a multi-member stream — gzip readers consume members
back-to-back).

Scale shape: WARC-gzip is NOT splittable (member boundaries are
unknowable without scanning), so the unit of parallelism is the FILE —
exactly how production CC jobs run (~72k × ~1 GB files per crawl =
plenty of splits for any cluster). The reader is `binaryFile` scan →
one Arrow-batched parse stage; everything downstream (html_blocks,
extract_triples_from_rich_html) is source-agnostic.

Both directions are implemented so the round-trip is testable without
external data: :func:`write_warc_py` emits spec-shaped bytes (used by
the fixture writer and the `warc_roundtrip` catalog query),
:func:`parse_warc_bytes` reads them (and any conforming file) back.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
    ]
)

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


_READ_CHUNK = 1 << 20  # 1 MiB decompressed per read


def iter_warc_records(stream) -> Iterator[dict]:
    """Incremental WARC record iterator over a file-like of (plain or
    gzip) WARC bytes → yields {url, warc_date, html} per ``response``
    record. Non-response records (warcinfo, request, metadata) are
    skipped; the HTTP response header block is stripped from the
    payload. Lenient: a malformed tail ends the scan rather than
    raising.

    Memory: gzip members are inflated through ``gzip.GzipFile`` (the
    stdlib reader consumes concatenated members back-to-back — the CC
    multi-member layout) in 1 MiB steps, and consumed bytes are dropped
    from the working buffer after each record — peak Python heap is
    O(largest record), not O(decompressed file). That is what lets a
    task hold a ~1 GB production .warc.gz (≈3-4 GB inflated) without
    materializing the inflation.
    """
    head = stream.read(2)
    if head == b"\x1f\x8b":
        # NOT gzip.GzipFile: its read() raises BadGzipFile on a non-gzip
        # tail and DISCARDS decompressed bytes it had already buffered in
        # that call — truncating the record in flight. The member-walker
        # below stops cleanly at the first non-member byte instead.
        stream = _LenientGzip(_Prepend(head, stream))
    else:
        stream = _Prepend(head, stream)
    buf = bytearray()
    pos = 0

    def fill() -> bool:
        nonlocal pos
        if pos:  # drop consumed prefix so the buffer stays record-sized
            del buf[:pos]
            pos = 0
        try:
            chunk = stream.read(_READ_CHUNK)
        except (OSError, EOFError):
            # lenient contract: non-gzip garbage after the last member
            # (BadGzipFile ⊂ OSError) ends the scan, never raises
            return False
        if not chunk:
            return False
        buf.extend(chunk)
        return True

    while True:
        he = buf.find(_HDR_END, pos)
        while he < 0:
            if not fill():
                return
            he = buf.find(_HDR_END, pos)
        header = bytes(buf[pos:he]).decode("utf-8", errors="replace")
        lines = header.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if sep:
                fields[k.strip()] = v.strip()
        try:
            length = int(fields["Content-Length"])
        except (KeyError, ValueError):
            return
        body_at = he + 4
        while len(buf) < body_at + length + 4:  # body + trailing CRLFs
            # body_at is an offset into buf; fill() shifts buf by pos
            shift = pos
            if not fill():
                break
            body_at -= shift
            he -= shift
        body = bytes(buf[body_at : body_at + length])
        pos = body_at + length
        while buf[pos : pos + 2] == _CRLF:
            pos += 2
        if fields.get("WARC-Type") != "response":
            continue
        hhe = body.find(_HDR_END)
        html = body[hhe + 4 :] if hhe >= 0 else body
        yield {
            "url": fields.get("WARC-Target-URI", ""),
            "warc_date": fields.get("WARC-Date", ""),
            "html": html,
        }


class _LenientGzip:
    """Member-by-member gzip inflater over a raw byte stream.

    Walks concatenated gzip members (Common Crawl's per-record layout)
    with one ``zlib.decompressobj(31)`` per member, surfacing plain
    ``read(n)`` of decompressed bytes. Lenient by contract: a non-gzip
    byte at a member boundary, a truncated final member, or a zlib error
    all end the stream instead of raising — pairing with
    :func:`iter_warc_records`'s malformed-tail semantics. Compressed
    input is pulled in `_READ_CHUNK` slices, so heap stays O(chunk +
    requested output), never O(file)."""

    def __init__(self, raw):
        self._raw = raw
        self._z = None  # active member's decompressor
        self._buf = b""  # compressed bytes not yet consumed
        self._eof = False

    def read(self, n: int = -1) -> bytes:
        out = bytearray()
        while (n < 0 or len(out) < n) and not self._eof:
            if self._z is None:
                while len(self._buf) < 2:
                    chunk = self._raw.read(_READ_CHUNK)
                    if not chunk:
                        break
                    self._buf += chunk
                if self._buf[:2] != b"\x1f\x8b":
                    self._eof = True
                    break
                self._z = zlib.decompressobj(31)
            if not self._buf:
                chunk = self._raw.read(_READ_CHUNK)
                if not chunk:
                    self._eof = True  # truncated member: stop, don't raise
                    break
                self._buf = chunk
            want = (n - len(out)) if n >= 0 else 0  # 0 = unlimited
            try:
                piece = self._z.decompress(self._buf, want)
            except zlib.error:
                self._eof = True
                break
            if self._z.eof:
                self._buf = self._z.unused_data
                self._z = None
            else:
                self._buf = self._z.unconsumed_tail
            out += piece
        return bytes(out)


class _Prepend:
    """Tiny file-like that replays `head` before delegating to `raw` —
    lets the gzip sniff peek 2 bytes off an arbitrary stream."""

    def __init__(self, head: bytes, raw):
        self._head = head
        self._raw = raw

    def read(self, n: int = -1) -> bytes:
        if self._head:
            if n is None or n < 0 or n >= len(self._head):
                out, self._head = self._head, b""
                rest = self._raw.read(-1 if n is None or n < 0 else n - len(out))
                return out + rest
            out, self._head = self._head[:n], self._head[n:]
            return out
        return self._raw.read(n)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """WARC bytes (plain or gzip) → [{url, warc_date, html}] — the
    list form of :func:`iter_warc_records` (which see for semantics
    and the streaming-decompress memory bound)."""
    return list(iter_warc_records(io.BytesIO(data)))


def _http_payload(html: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + _HDR_END + html
    )


def write_warc_py(
    records: list[tuple[str, str, bytes]], gzip_records: bool = True
) -> bytes:
    """[(url, iso_date, html)] → WARC bytes (spec layout above).

    ``gzip_records=True`` emits one gzip member per record — the
    Common-Crawl ``.warc.gz`` layout; False emits a plain ``.warc``.
    """
    out = io.BytesIO()
    for url, iso_date, html in records:
        payload = _http_payload(html)
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"WARC-Date: " + iso_date.encode() + _CRLF
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: " + str(len(payload)).encode() + _HDR_END
            + payload + _CRLF + _CRLF
        )
        out.write(gzip.compress(rec, mtime=0) if gzip_records else rec)
    return out.getvalue()


_EMIT_ROWS = 4096  # pages per emitted Arrow batch


def _parse_content_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch kernel shared by the batch and streaming readers.

    Emits output frames every `_EMIT_ROWS` pages instead of one frame
    per input file, so a 1 GB .warc.gz flows through in bounded slices
    (pairs with iter_warc_records' O(record) inflation bound)."""
    rows: list[dict] = []

    def flush() -> pd.DataFrame:
        ts = pd.to_datetime(
            [r["warc_date"] for r in rows], utc=True, errors="coerce"
        ).tz_localize(None)
        out = pd.DataFrame(
            {
                "url": [r["url"] for r in rows],
                "warc_ts": ts,
                "html": [r["html"] for r in rows],
            }
        )
        rows.clear()
        return out

    for pdf in batches:
        for content in pdf["content"]:
            for rec in iter_warc_records(io.BytesIO(bytes(content))):
                rows.append(rec)
                if len(rows) >= _EMIT_ROWS:
                    yield flush()
    if rows:
        yield flush()


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files → pages(url, warc_ts, html).

    ``binaryFile`` scan (one task per file — the CC parallelism unit)
    into one Arrow-batched parse stage. WARC-Date (ISO 8601, Z) parses
    to a naive UTC timestamp.
    """
    files = spark.read.format("binaryFile").load(path_glob)
    return files.select("content").mapInPandas(
        _parse_content_batches, WARC_PAGES_SCHEMA
    )


def stream_warc(
    spark: SparkSession,
    path_dir: str,
    max_files_per_trigger: int = 1,
    glob_filter: str = "*.warc.gz",
) -> DataFrame:
    """Streaming WARC ingest: the continuous-crawl front door.

    The SAME parse kernel as :func:`read_warc` over the binaryFile
    *stream* source — new ``.warc.gz`` files appearing in `path_dir`
    become micro-batches (`maxFilesPerTrigger` files each; keep it
    below the file count to really exercise multi-batch commits).
    Downstream extraction lifts unchanged (narrow maps), so a crawl
    bucket can be tailed into the triple store with exactly-once
    parquet sinks — the `warc_stream_ingest` catalog query drives this
    end-to-end under the batch oracle.
    """
    files = (
        spark.readStream.format("binaryFile")
        # the binaryFile source's schema is fixed, but the STREAM reader
        # requires it stated explicitly (no inference on streams)
        .schema("path string, modificationTime timestamp, length bigint, content binary")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob_filter)
        .load(path_dir)
    )
    return files.select("content").mapInPandas(
        _parse_content_batches, WARC_PAGES_SCHEMA
    )
