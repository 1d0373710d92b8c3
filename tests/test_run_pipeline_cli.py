"""End-to-end CLI smoke: the spark-submit entry point, run for real.

Covers the full north-star tail in one shot: synthetic pages → chunked
resumable extraction → lineage → canonical entity table written with
the corpus-global alias clusterer (the --canonicalize path has no other
end-to-end coverage).
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile


def test_run_pipeline_synthetic_canonicalize(spark):
    out_dir = tempfile.mkdtemp(prefix="kgcli_")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        proc = subprocess.run(
            [
                sys.executable, os.path.join(repo, "jobs", "run_pipeline.py"),
                "--synthetic", "300", "--output", out_dir,
                "--chunks", "2", "--master", "local[4]", "--canonicalize",
            ],
            capture_output=True, text=True, timeout=600,
            env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        assert sorted(summary["chunks_run"]) == [0, 1]
        assert summary["n_triples_written"] > 0
        assert summary["edges_total"] > 0
        assert summary["canonical_entities"] > 0

        canon = spark.read.parquet(f"{out_dir}/entities_canonical")
        rows = {r.canonical: list(r.surfaces) for r in canon.collect()}
        # alias clusterer: case variants of one entity merge under the
        # min surface; distinct head-token-sharing entities do NOT
        assert summary["canonical_entities"] == len(rows)
        heads = [c for c in rows if c.lower().startswith("aarhus")]
        assert len(heads) >= 2, heads  # Aarhus Airport vs Aarhus Lufthavn A/S stay apart
        for canonical, surfaces in rows.items():
            assert canonical in surfaces
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_run_pipeline_warc_ingest(spark):
    """Crawl front door through the CLI: .warc.gz files in → block-filter
    rich extraction → chunked resumable sink. Expected triple count is
    the fixture gold over ALL docs (--assume-lang en admits the xx
    pages too — their sentences are rendered from the same templates)."""
    from rdf_to_text_spark import fixtures_web
    from rdf_to_text_spark.fixtures import render_page_py
    from rdf_to_text_spark.sources.warc import write_warc_py

    n = 120
    expected = sum(len(render_page_py(d)["gold"]) for d in range(n))
    out_dir = tempfile.mkdtemp(prefix="kgcli_warc_out_")
    warc_dir = tempfile.mkdtemp(prefix="kgcli_warc_in_")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        for i in range(3):
            recs = []
            for d in range(i * 40, (i + 1) * 40):
                page = fixtures_web.render_rich_page_py(d)
                recs.append((page["url"], f"2024-01-01T00:00:{d % 60:02d}Z", page["html"]))
            with open(os.path.join(warc_dir, f"p{i}.warc.gz"), "wb") as f:
                f.write(write_warc_py(recs))
        proc = subprocess.run(
            [
                sys.executable, os.path.join(repo, "jobs", "run_pipeline.py"),
                "--warc", warc_dir, "--output", out_dir,
                "--chunks", "2", "--master", "local[4]",
            ],
            capture_output=True, text=True, timeout=600,
            env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        assert sorted(summary["chunks_run"]) == [0, 1]
        assert summary["n_triples_written"] == expected, summary
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(warc_dir, ignore_errors=True)


def test_run_pipeline_structdata_union(spark):
    """--structdata: prose triples + JSON-LD facts in ONE sink stream.

    Prose rows (sent_idx >= 0, lang-gated) must equal the gold en-fact
    set; structured rows (sent_idx = -1) must equal the gold fact set
    over ALL pages (structured data is lang-independent), so xx pages
    contribute structured-only facts."""
    from rdf_to_text_spark.fixtures import gold_triples_py
    from rdf_to_text_spark.fixtures_struct import struct_hits_py

    n = 240
    out_dir = tempfile.mkdtemp(prefix="kgcli_sd_")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        proc = subprocess.run(
            [
                sys.executable, os.path.join(repo, "jobs", "run_pipeline.py"),
                "--synthetic", str(n), "--output", out_dir,
                "--chunks", "2", "--master", "local[4]", "--structdata",
            ],
            capture_output=True, text=True, timeout=600,
            env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        edges = spark.read.parquet(f"{out_dir}/edges")
        rows = edges.select("doc_id", "sent_idx", "subj", "pred", "obj").collect()
        prose = {(r.doc_id, r.subj, r.pred, r.obj) for r in rows if r.sent_idx >= 0}
        struct = {(r.doc_id, r.subj, r.pred, r.obj) for r in rows if r.sent_idx == -1}
        gold_en = {
            (d, subj, pred, obj)
            for d, _s, subj, pred, obj in gold_triples_py(list(range(n)))
        }
        gold_all = {
            (d, h["subj"], h["pred"], h["obj"])
            for d in range(n)
            for h in struct_hits_py(d)
        }
        assert prose == gold_en
        assert struct == gold_all
        assert struct - prose  # xx pages: structured-only facts exist
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_run_pipeline_warc_detect_lang(spark):
    """--detect-lang: a gibberish (zero-stopword) capture is gated out
    before extraction; the English page's triples all survive."""
    from rdf_to_text_spark.fixtures import render_page_py
    from rdf_to_text_spark.fixtures_web import render_rich_page_py
    from rdf_to_text_spark.sources.warc import write_warc_py

    d = 1  # en page with gold triples
    page = render_rich_page_py(d)
    gibberish = (
        b"<html><body><p>zzz qqq vvv kkk mmm nnn ppp rrr sss ttt</p></body></html>"
    )
    out_dir = tempfile.mkdtemp(prefix="kgcli_lid_out_")
    warc_dir = tempfile.mkdtemp(prefix="kgcli_lid_in_")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        recs = [
            (page["url"], "2024-01-01T00:00:01Z", page["html"]),
            ("https://synth.example/x/99999999", "2024-01-01T00:00:02Z", gibberish),
        ]
        with open(os.path.join(warc_dir, "p0.warc.gz"), "wb") as f:
            f.write(write_warc_py(recs))
        proc = subprocess.run(
            [
                sys.executable, os.path.join(repo, "jobs", "run_pipeline.py"),
                "--warc", warc_dir, "--detect-lang",
                "--output", out_dir, "--chunks", "1", "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=600,
            env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        assert summary["n_triples_written"] == len(render_page_py(d)["gold"])
        subs = {
            r.subj
            for r in spark.read.parquet(f"{out_dir}/edges").select("subj").collect()
        }
        assert subs  # from the English page only; gibberish contributed none
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(warc_dir, ignore_errors=True)


def test_run_pipeline_link_prior(spark):
    """--link-prior writes mentions_linked/ from the WRITTEN edge table:
    every mention resolves to a candidate of its first-token alias set,
    and at least one prior-scored decision carries a positive score."""
    out_dir = tempfile.mkdtemp(prefix="kgcli_")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        proc = subprocess.run(
            [
                sys.executable, os.path.join(repo, "jobs", "run_pipeline.py"),
                "--synthetic", "300", "--output", out_dir,
                "--chunks", "2", "--master", "local[4]", "--link-prior",
            ],
            capture_output=True, text=True, timeout=600,
            env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        assert summary["mentions_linked"] > 0

        from rdf_to_text_spark.templates import first_token_candidates

        cands: dict[str, set] = {}
        for m, e in first_token_candidates():
            cands.setdefault(m, set()).add(e)
        linked = spark.read.parquet(f"{out_dir}/mentions_linked").collect()
        assert len(linked) == summary["mentions_linked"]
        assert all(r.entity in cands[r.mention] for r in linked)
        assert any(r.score > 0 for r in linked)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_run_pipeline_curate(spark):
    """--curate: the curation capstone as a spark-submit stage — writes
    curated_shards/ (doc_id, n_bpe, bucket, shard) over rich pages."""
    out_dir = tempfile.mkdtemp(prefix="kgcli_curate_")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        proc = subprocess.run(
            [
                sys.executable, os.path.join(repo, "jobs", "run_pipeline.py"),
                "--synthetic", "400", "--rich-html", "--output", out_dir,
                "--chunks", "2", "--master", "local[4]", "--curate",
            ],
            capture_output=True, text=True, timeout=600,
            env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        assert summary["curated_docs"] > 0
        assert summary["curated_shards"] > 1  # the budget actually splits

        cur = spark.read.parquet(f"{out_dir}/curated_shards")
        rows = sorted(
            ((r.doc_id, r.n_bpe, r.bucket, r.shard) for r in cur.collect())
        )
        # packing invariants: shard monotone in doc_id order, shard =
        # floor(exclusive prefix / 1000), every kept doc quality-gated
        cum = 0
        for _doc, n_bpe, bucket, shard in rows:
            assert shard == cum // 1000
            assert bucket in ("long", "short")
            assert n_bpe >= 20  # gate floor is 30 ws tokens
            cum += n_bpe
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
