"""Byte-identity against the reference's own frozen artifacts.

`webnlg_eval_scripts/test-all-notdelex-source.triple` is a frozen output
of the reference preprocessing (632+ sorted distinct linearized
sources). Reproducing its lines from the raw XML through OUR S2 reader +
P2-P5 normalization chain is the strongest per-row invariant check
available: byte equality on real WebNLG data, not synthetic fixtures.

589 of 633 frozen lines reproduce byte-identically. The 44 misses are
corpus-version drift in the DATA, not normalization: e.g. the frozen
file says ``nationality | American`` where the shipped XML says
``nationality | United States`` (verified char-by-char) — the frozen
artifact predates a corpus revision. The test pins 589 so any
normalization regression (which would drop matches) fails loudly.
"""

import os

import pytest

from rdf_to_text_spark.functions.textnorm import normalize

REF = "/root/reference"
FROZEN = f"{REF}/webnlg_eval_scripts/test-all-notdelex-source.triple"
XML = f"{REF}/data/test/testdata_unseen_with_lex.xml"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FROZEN) and os.path.exists(XML)),
    reason="reference corpus not available",
)


def _linearize(mtriples) -> str:
    """P2-P5: s|p|o joined <TSP>, trailing space per triple, strip _ and
    quotes, tokenize, squeeze (webnlg_gcnonmt_input.py:176-187, 200)."""
    out, sep = "", ""
    for t in mtriples:
        out += sep + t.s + "|" + t.p + "|" + t.o + " "
        sep = "<TSP>"
    return normalize(out.replace("_", " ").replace('"', ""))


def test_frozen_source_lines_reproduce_byte_identically(spark):
    from rdf_to_text_spark.sources.readers import read_benchmark_xml

    frozen = [l.rstrip("\n") for l in open(FROZEN)]
    rows = read_benchmark_xml(spark, XML).collect()
    ours = {_linearize(r.mtriples) for r in rows}
    matched = sum(1 for l in frozen if l in ours)
    # 589/633 byte-identical; remainder is corpus-version drift (see module doc)
    assert matched >= 589, f"byte-identity regressed: {matched}/633"


def test_reference_xml_reader_counts(spark):
    """The unseen test corpus parses to its known shape."""
    from rdf_to_text_spark.sources.readers import read_benchmark_xml

    rows = read_benchmark_xml(spark, XML).collect()
    assert len(rows) == 891
    assert {r.category for r in rows} == {
        "Artist", "Athlete", "CelestialBody", "MeanOfTransportation", "Politician"
    }
