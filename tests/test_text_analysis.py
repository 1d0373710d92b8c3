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


def test_bpe_pair_counts_matches_naive(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest widest low"), (3, "  ")],
        "doc_id long, text string",
    )
    from rdf_to_text_spark.operators.text_analysis import bpe_pair_counts

    got = {(r.left, r.right): r.n for r in bpe_pair_counts(docs).collect()}
    # naive recount
    from collections import Counter
    wc = Counter("low low lower newest widest low".split())
    want = Counter()
    for w, n in wc.items():
        for a, b in zip(w, w[1:]):
            want[(a, b)] += n
    assert got == dict(want)


def test_bpe_learn_merges_reference_parity(spark):
    """The driver-side greedy loop vs an independent naive replay:
    identical merge tables on a corpus with real tie cases."""
    text = "low low low lower lower newest newest newest newest widest"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from rdf_to_text_spark.operators.text_analysis import bpe_learn_merges

    got = bpe_learn_merges(docs, n_merges=8)

    # independent naive reference (recount + re-merge from scratch)
    from collections import Counter
    words = Counter(text.split())
    vocab = {w: list(w) for w in words}
    want = []
    for step in range(8):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        if not pc:
            break
        best = max(pc.values())
        pair = min(p for p, c in pc.items() if c == best)
        want.append((step, pair[0], pair[1], best))
        for w, syms in vocab.items():
            i = 0
            while i < len(syms) - 1:
                if (syms[i], syms[i + 1]) == pair:
                    syms[i : i + 2] = [pair[0] + pair[1]]
                else:
                    i += 1
    assert got == want
    # classic BPE sanity: 'est' assembles within the first merges
    merged_syms = {l + r for _s, l, r, _n in got}
    assert "es" in merged_syms or "st" in merged_syms


def test_bpe_learn_merges_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    from rdf_to_text_spark.operators.text_analysis import bpe_learn_merges

    a = bpe_learn_merges(docs, n_merges=10)
    b = bpe_learn_merges(docs, n_merges=10)
    assert a == b and len(a) == 10
