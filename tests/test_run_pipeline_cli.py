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
