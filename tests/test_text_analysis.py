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


def test_repetition_stats_crafted(spark):
    from rdf_to_text_spark.operators.text_analysis import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "same line\nsame line\nunique\nsame line"),
            (2, "a b a b a b"),  # top bigram 'a b' x3
            (3, "once"),          # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = got[1]
    assert r1.n_lines == 4 and r1.n_dup_lines == 3
    assert r1.dup_line_chars == 3 * len("same line")
    assert got[2].top_bigram_n == 3
    assert got[3].top_bigram_n == 0 and got[3].n_dup_lines == 0


def test_pii_redact_order_and_masks(spark):
    from rdf_to_text_spark.operators.text_analysis import pii_redact

    docs = spark.createDataFrame(
        [
            # the email's digits/dots must be consumed by the EMAIL
            # pattern first — not double-counted as an IP or phone
            (1, "write to a.b-9@host10.example.com or 10.0.0.1 or +4512345678"),
            (2, "clean text, no pii at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert (got[1].n_emails, got[1].n_ipv4, got[1].n_phones) == (1, 1, 1)
    assert (got[2].n_emails, got[2].n_ipv4, got[2].n_phones) == (0, 0, 0)
    import hashlib
    want = "write to <EMAIL> or <IP> or <PHONE>"
    assert got[1].redacted_md5 == hashlib.md5(want.encode()).hexdigest()


def test_ngram_overlap_flags_counts_distinct(spark):
    from rdf_to_text_spark.operators.text_analysis import ngram_overlap_flags

    bench = spark.createDataFrame(
        [(100, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # shares two distinct 8-grams with the benchmark
            (1, "zero one two three four five six seven eight nine ten"),
            (2, "totally different words with no overlap here at all ok"),
            # repeats the same overlapping 8-gram twice: DISTINCT => 1
            # (the seam grams wrap around and match nothing)
            (3, "one two three four five six seven eight "
                "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_hit_grams for r in ngram_overlap_flags(docs, bench).collect()}
    assert got.get(1) == 2      # [one..eight], [two..nine]
    assert 2 not in got         # clean doc not flagged
    assert got.get(3) == 1      # duplicates collapse to one distinct gram
