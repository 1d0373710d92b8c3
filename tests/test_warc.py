"""WARC source (sources/warc.py): spec round-trip + Spark reader."""

import gzip

from rdf_to_text_spark import fixtures_web
from rdf_to_text_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc_py,
)


def _recs(n):
    out = []
    for d in range(n):
        page = fixtures_web.render_rich_page_py(d)
        out.append((page["url"], f"2024-01-01T00:00:{d % 60:02d}Z", page["html"]))
    return out


def test_roundtrip_plain_and_gzip():
    recs = _recs(40)
    for gz in (False, True):
        back = parse_warc_bytes(write_warc_py(recs, gzip_records=gz))
        assert [(b["url"], b["warc_date"], b["html"]) for b in back] == recs


def test_gzip_is_multi_member():
    """CC layout: one gzip member per record — a reader seeking to any
    member boundary can decompress independently."""
    recs = _recs(3)
    data = write_warc_py(recs, gzip_records=True)
    # each member alone must decompress to exactly one record
    starts = [i for i in range(len(data) - 1) if data[i : i + 2] == b"\x1f\x8b"]
    assert len(starts) >= 3
    one = gzip.decompress(data[starts[0] : starts[1]])
    assert len(parse_warc_bytes(one)) == 1


def test_non_response_records_skipped():
    info = b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ntest\r\n\r\n"
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    data = info + req + write_warc_py(_recs(2), gzip_records=False)
    assert len(parse_warc_bytes(data)) == 2


def test_http_headers_stripped():
    back = parse_warc_bytes(write_warc_py(_recs(1), gzip_records=False))
    assert back[0]["html"].startswith(b"<!DOCTYPE html>")
    assert b"HTTP/1.1" not in back[0]["html"]


def test_malformed_tail_is_lenient():
    data = write_warc_py(_recs(2), gzip_records=False) + b"WARC/1.0\r\ngarbage"
    assert len(parse_warc_bytes(data)) == 2
    assert parse_warc_bytes(b"") == []
    assert parse_warc_bytes(b"not a warc at all") == []


def test_spark_read_warc(spark, tmp_path):
    recs = _recs(30)
    for i in range(3):
        part = recs[i * 10 : (i + 1) * 10]
        (tmp_path / f"part-{i}.warc.gz").write_bytes(
            write_warc_py(part, gzip_records=True)
        )
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    got = df.toPandas().sort_values("url").reset_index(drop=True)
    assert len(got) == 30
    by_url = {r[0]: r for r in recs}
    for _, row in got.iterrows():
        url, date, html = by_url[row.url]
        assert bytes(row.html) == html
        assert row.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ") == date


def test_stream_warc_equals_batch(spark, tmp_path):
    """stream_warc over the same files yields the same page set as
    read_warc, across >1 micro-batch."""
    from rdf_to_text_spark.sources.warc import stream_warc

    recs = _recs(24)
    for i in range(3):
        part = recs[i * 8 : (i + 1) * 8]
        (tmp_path / f"p{i}.warc.gz").write_bytes(write_warc_py(part))
    batch = {
        (r.url, bytes(r.html))
        for r in read_warc(spark, str(tmp_path / "*.warc.gz")).collect()
    }
    q = (
        stream_warc(spark, str(tmp_path), max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("warc_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(1 for p in q.recentProgress if (p.get("numInputRows") or 0) > 0)
    assert n_batches >= 2, n_batches
    streamed = {
        (r.url, bytes(r.html))
        for r in spark.sql("SELECT * FROM warc_stream_test").collect()
    }
    assert streamed == batch and len(batch) == 24


def test_iter_warc_records_streaming_large_record():
    """Records larger than the 1 MiB read chunk cross fill() boundaries:
    the incremental parser must reassemble them exactly (buffer-shift
    arithmetic), for both plain and gzip input, with a malformed tail
    ending the scan cleanly."""
    import gzip as _gzip
    import io as _io

    from rdf_to_text_spark.sources.warc import iter_warc_records, write_warc_py

    big = (b"<p>" + b"x" * 997) * 2600  # ~2.6 MB > _READ_CHUNK
    recs = [
        ("https://a.example/1", "2024-01-01T00:00:00Z", big),
        ("https://a.example/2", "2024-01-02T00:00:00Z", b"<p>small</p>"),
    ]
    for gz in (False, True):
        data = write_warc_py(recs, gzip_records=gz) + b"GARBAGE-TAIL-NOT-WARC"
        got = list(iter_warc_records(_io.BytesIO(data)))
        assert [(r["url"], r["warc_date"], len(r["html"])) for r in got] == [
            ("https://a.example/1", "2024-01-01T00:00:00Z", len(big)),
            ("https://a.example/2", "2024-01-02T00:00:00Z", 12),
        ]
        assert got[0]["html"] == big
    # whole-member gzip of the combined stream (not per-record members)
    whole = _gzip.compress(write_warc_py(recs, gzip_records=False))
    got = list(iter_warc_records(_io.BytesIO(whole)))
    assert len(got) == 2 and got[0]["html"] == big
