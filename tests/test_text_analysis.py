"""Text-analysis operators vs pure-Python twins."""

import re

from rdf_to_text_spark.operators.text_analysis import (
    BPE_ISH_PATTERN,
    bpe_token_count,
)


def test_bpe_token_count_matches_python_re(spark):
    """The engine-side regexp_extract_all must reproduce Python `re`
    exactly on contraction, digit-run, punctuation-run, and
    whitespace-run shapes (the same pattern runs in RE2 for the DuckDB
    oracle)."""
    texts = [
        "I've got 42 cats, don't I?  YES!",
        "hello world",
        "   leading and trailing   ",
        "a1b2c3 --- ...punct... 'quoted'",
        "it's we're they'll you've I'd I'm can't",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens) for r in bpe_token_count(docs).collect()}
    for i, t in enumerate(texts):
        exp_ws = len(t.strip().split()) if t.strip() else len(re.split(r"\s+", t.strip()))
        exp_bpe = len([m for m in re.findall(BPE_ISH_PATTERN, t) if m.strip()])
        assert got[i][1] == exp_bpe, (i, t, got[i])
        if t.strip():
            assert got[i][0] == exp_ws, (i, t, got[i])
