"""applyInPandasWithState running counts: stream ≡ batch invariant."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rdf_to_text_spark import fixtures
from rdf_to_text_spark.pipeline import extract_pipeline
from rdf_to_text_spark.streaming.stateful import stream_running_counts


def test_running_counts_accumulate_across_microbatches(spark):
    work = tempfile.mkdtemp(prefix="stateful_test_")
    try:
        for i in range(3):
            fixtures.pages_from_range(spark, 150, partitions=1).filter(
                (F.col("doc_id") % 3) == i
            ).coalesce(1).write.parquet(f"{work}/pages/f{i}", mode="overwrite")
        os.makedirs(f"{work}/flat", exist_ok=True)
        for i, p in enumerate(glob.glob(f"{work}/pages/f*/part-*.parquet")):
            shutil.copy(p, f"{work}/flat/{i:03d}.parquet")

        q = stream_running_counts(
            spark, f"{work}/flat", f"{work}/ckpt", query_name="rc_test"
        )
        q.awaitTermination(180)

        final = spark.sql(
            "SELECT entity, max(total_mentions) AS total, max(batches_seen) AS b "
            "FROM rc_test GROUP BY entity"
        ).collect()
        stream_totals = {r.entity: r.total for r in final}
        # state genuinely accumulated across more than one micro-batch
        assert max(r.b for r in final) >= 2

        batch = extract_pipeline(spark.read.parquet(f"{work}/flat"), use_html=True)
        batch_totals = {
            r.subj: r.cnt
            for r in batch.groupBy("subj").agg(F.count("*").alias("cnt")).collect()
        }
        assert stream_totals == batch_totals
    finally:
        shutil.rmtree(work, ignore_errors=True)
