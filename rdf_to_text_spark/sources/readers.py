"""Sources: WebNLG-style XML corpora, aligned line files, page tables.

Spark-first re-expressions of the reference's readers (SURVEY.md §2.1):

  * S1 `select_files` directory/size/category scan → glob + pruning;
  * S2 `Benchmark.fill_benchmark` XML parse (skip entries with no lex)
    → whole-file reads + ElementTree inside ``mapInPandas`` (spark-xml
    is not on the cluster; files are small, entries are many);
  * S4 aligned ``.triple``/``.lex`` line files → two ``spark.read.text``
    with ``row_number`` zip-join.
"""

from __future__ import annotations

import xml.etree.ElementTree as Et
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

TRIPLE_STRUCT = StructType(
    [StructField("s", StringType()), StructField("p", StringType()), StructField("o", StringType())]
)

ENTRY_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("eid", StringType()),
        StructField("category", StringType()),
        StructField("size", StringType()),  # kept as string (benchmark_reader.py:84)
        StructField("mtriples", ArrayType(TRIPLE_STRUCT)),
        StructField("otriples", ArrayType(TRIPLE_STRUCT)),
        StructField("lexs", ArrayType(StringType())),
    ]
)


def select_files_glob(topdir: str, category: str = "", sizes: tuple[int, int] | int = (1, 8)) -> str:
    """S1: the size-bucket directory convention as a glob pattern.

    `webnlg_baseline_input.py:13-35`: size buckets are `{n}triples/`
    subdirs; size=0 means a flat directory; category is a filename
    substring filter (applied by the caller via input_file_name()).
    """
    if sizes == 0:
        return f"{topdir}/*{category}*.xml" if category else f"{topdir}/*.xml"
    lo, hi = sizes
    buckets = ",".join(str(i) for i in range(lo, hi))
    mid = f"*{category}*" if category else "*"
    return f"{topdir}/{{{buckets}}}triples/{mid}.xml"


def read_benchmark_xml(spark: SparkSession, path_glob: str) -> DataFrame:
    """S2: WebNLG XML corpus → one row per entry.

    Entries with no <lex> are skipped (`benchmark_reader.py:73-80`).
    Whole files are read with binaryFile (they are small); parsing runs
    ElementTree inside Arrow batches.
    """
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                root = Et.fromstring(content)
                for xml_entry in root.iter("entry"):
                    lexs = [c.text or "" for c in xml_entry if c.tag == "lex"]
                    if not lexs:  # skip: benchmark_reader.py:73-80
                        continue

                    def triples_of(tag: str) -> list[tuple[str, str, str]]:
                        out = []
                        for ts in xml_entry.iter(tag):
                            for t in ts:
                                s, p, o = t.text.split(" | ")
                                out.append((s, p, o))
                        return out

                    rows.append(
                        (
                            path,
                            xml_entry.attrib.get("eid", ""),
                            xml_entry.attrib.get("category", ""),
                            xml_entry.attrib.get("size", ""),
                            triples_of("modifiedtripleset"),
                            triples_of("originaltripleset"),
                            lexs,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in ENTRY_SCHEMA.fields])

    return files.mapInPandas(parse, ENTRY_SCHEMA)


def read_aligned_lines(
    spark: SparkSession, triple_path: str, lex_path: str
) -> DataFrame:
    """S4/J1: zip two line files on line number → (line_id, triple, lex).

    The reference relies on readlines() order; here each side gets a
    ``row_number`` over a zero-shuffle monotonic id (text sources are
    single-split in the reference layout; for multi-split inputs use a
    line-keyed format instead — this reader asserts one partition).
    """
    t = spark.read.text(triple_path)
    l = spark.read.text(lex_path)
    w = Window.orderBy(F.monotonically_increasing_id())
    t = t.select(F.row_number().over(w).alias("line_id"), F.col("value").alias("triple"))
    l = l.select(F.row_number().over(w).alias("line_id"), F.col("value").alias("lex"))
    return t.join(l, "line_id")


def entry_stats(entries: DataFrame) -> dict[str, DataFrame]:
    """The reference Benchmark's aggregate surface (A3-A5, A7) as
    DataFrame queries over the entry table."""
    exploded = entries.select(F.explode("mtriples").alias("t"))
    return {
        # A3 unique_p — benchmark_reader.py:99-101
        "unique_p": exploded.agg(F.countDistinct("t.p").alias("unique_p")),
        # A4 entry_count(size, cat) — all four cases as one cube (:103-118)
        "entry_cube": entries.cube("size", "category").agg(F.count("*").alias("n")),
        # A5 total_lexcount (:95-97)
        "total_lexcount": entries.agg(F.sum(F.size("lexs")).alias("total_lexcount")),
        # A7 property_map (:124-130): positional pairing of modified/original preds
        "property_map": (
            entries.select(
                F.posexplode("mtriples").alias("i", "mt"),
                F.col("otriples"),
            )
            .select(F.col("mt.p").alias("mpred"), F.expr("otriples[i].p").alias("opred"))
            .groupBy("mpred")
            .agg(F.collect_set("opred").alias("opreds"))
        ),
    }
