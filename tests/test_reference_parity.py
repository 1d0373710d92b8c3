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


PRE = f"{REF}/data/preprocess_input"


def test_frozen_vocab_reproduces_from_full_train_split(spark):
    """Full-TRAIN-split parity (18,102 aligned pairs, 36,204 lines):
    our distributed A1/A2 vocab over the frozen train
    `train-webnlg-all-delex.{triple,lex}` must reproduce the frozen
    `vocab_id2word` artifact the reference built from the same files
    (build_vocab.py:20-57, original paths at :4-5):

      * identical vocabulary SET and size (2,793 words incl. specials);
      * our counts non-increasing along the frozen rank order (2,785
        adjacent pairs checked). `Counter.most_common` breaks count
        ties by insertion order — unreproducible by design — so tie
        order is the single degree of freedom left unpinned.

    NOTE on the .triple/.lex files themselves: their typed masks
    (`ENTITIES_1 PLACE ARCHITECTURAL STRUCTURE`) come from an upstream
    ontology-typing tool whose code is NOT in the reference repo — the
    reference's own delexicalisation() produces `CATEGORY.upper()`
    masks (webnlg_baseline_input.py:70), so byte-reproducing those two
    files is impossible from shipped code; they are consumed, and this
    test pins the full consumption chain instead."""
    import json

    frozen = json.load(open(f"{PRE}/vocab_id2word"))
    w2id = json.load(open(f"{PRE}/vocab_word2id"))
    assert len(frozen) == 2793
    assert frozen[:7] == ["<pad>", "<start>", "<end>", "<unk>", "A0", "A1", "NE"]
    assert all(w2id[w] == i for i, w in enumerate(frozen))

    from rdf_to_text_spark.operators import vocab

    lines = spark.read.text(f"{PRE}/train-webnlg-all-delex.triple").unionByName(
        spark.read.text(f"{PRE}/train-webnlg-all-delex.lex")
    )
    got = vocab.build_vocab(lines, "value").collect()
    assert len(got) == len(frozen)
    assert {r.word for r in got} == set(frozen)
    counts = {r.word: r.cnt for r in got}
    tail = frozen[7:]
    violations = [
        (a, b) for a, b in zip(tail, tail[1:]) if counts[a] < counts[b]
    ]
    assert not violations, violations[:5]


def test_full_train_split_reader_and_relations(spark):
    """S4 aligned zip-join + A3/A8 over the full frozen train split:
    18,102 aligned (triple, lex) pairs; 247 distinct predicates."""
    from rdf_to_text_spark.sources.readers import read_aligned_lines

    joined = read_aligned_lines(
        spark, f"{PRE}/train-webnlg-all-delex.triple", f"{PRE}/train-webnlg-all-delex.lex"
    )
    from pyspark.sql import functions as F

    assert joined.count() == 18102
    preds = (
        joined.select(F.explode(F.split("triple", " < TSP > ")).alias("t"))
        .select(F.split("t", r" \| ").getItem(1).alias("pred"))
        .distinct()
    )
    assert preds.count() == 247


def test_reference_xml_reader_counts(spark):
    """The unseen test corpus parses to its known shape."""
    from rdf_to_text_spark.sources.readers import read_benchmark_xml

    rows = read_benchmark_xml(spark, XML).collect()
    assert len(rows) == 891
    assert {r.category for r in rows} == {
        "Artist", "Athlete", "CelestialBody", "MeanOfTransportation", "Politician"
    }
