"""End-to-end KG construction pipeline.

pages → text extraction → triple extraction (template bank + alias
ladder) → canonical triples. The whole chain up to the sink is a
single narrow map stage (no shuffle): Catalyst fuses the filter +
projections, and the Arrow-batched extraction runs once per input
split. At 100 TB / 1000 executors this scales with input splits; the
only shuffles in the wider pipeline are canonicalization (connected
components) and the final MERGE bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.extract import extract_triples, extract_triples_from_html


def extract_pipeline(pages: DataFrame, use_html: bool = False) -> DataFrame:
    """pages(doc_id, url, warc_ts?, html?, text?, lang) → linked triples.

    * ``lang = 'en'`` filter is applied *before* any Python work and —
      on a parquet/Iceberg source — pushes down to the scan.
    * When ``use_html`` is set the text is re-derived from the html
      payload and the whole decode → normalize → extract chain runs as
      ONE fused Arrow stage (byte-identical invariant preserved);
      otherwise the pre-extracted ``text`` column is trusted.
    """
    df = pages.filter(F.col("lang") == "en")
    if use_html:
        return extract_triples_from_html(df)
    return extract_triples(df)
