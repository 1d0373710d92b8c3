"""TokenGramScanner must be semantically identical to AhoCorasick.find_longest.

The AC automaton (functions/ahocorasick.py) is the executable spec of
the inverted P6 scan; the numpy scanner is the production kernel. These
tests pin them together on directed edges and random fuzz.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from rdf_to_text_spark.functions.ahocorasick import AhoCorasick
from rdf_to_text_spark.functions.mentionscan import TokenGramScanner


def _scan_one(patterns: list[str], tokens: list[str]) -> list[tuple[int, int, int]]:
    sc = TokenGramScanner(patterns)
    rows, starts, ends, pids = sc.scan_frame(pd.Series([" ".join(tokens)]))
    return [(int(s), int(e), int(p)) for s, e, p in zip(starts, ends, pids)]


def _spec(patterns: list[str], tokens: list[str]) -> list[tuple[int, int, int]]:
    ac = AhoCorasick({p: i for i, p in enumerate(patterns)})
    return ac.find_longest(tokens)


@pytest.mark.parametrize(
    "patterns,text",
    [
        (["a b", "b c", "c"], "a b c"),
        (["Aarhus", "Aarhus Airport", "Airport"], "Aarhus Airport serves Aarhus ."),
        (["b c d", "c d", "d"], "a b c d"),
        (["a b", "b c"], "a b c"),
        (["x y"], ""),
        (["a"], "a a a"),
        (["a b c d e", "c"], "a b c d e"),
    ],
)
def test_scanner_matches_spec_directed(patterns, text):
    toks = text.split(" ") if text else []
    assert _scan_one(patterns, toks) == _spec(patterns, toks)


def test_scanner_fuzz_vs_automaton():
    rng = random.Random(42)
    alphabet = [f"t{i}" for i in range(8)]
    for trial in range(60):
        n_pat = rng.randint(1, 10)
        pats: list[str] = []
        for _ in range(n_pat):
            length = rng.randint(1, 4)
            p = " ".join(rng.choice(alphabet) for _ in range(length))
            if p not in pats:
                pats.append(p)
        texts = []
        for _ in range(5):
            texts.append(" ".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30))))
        texts.append("")  # empty-doc edge in every batch
        sc = TokenGramScanner(pats)
        rows, starts, ends, pids = sc.scan_frame(pd.Series(texts))
        got: dict[int, list[tuple[int, int, int]]] = {}
        for r, s, e, p in zip(rows, starts, ends, pids):
            got.setdefault(int(r), []).append((int(s), int(e), int(p)))
        ac = AhoCorasick({p: i for i, p in enumerate(pats)})
        for i, text in enumerate(texts):
            toks = text.split(" ") if text else []
            assert got.get(i, []) == ac.find_longest(toks), (trial, i, pats, text)


def test_scanner_batch_rows_and_none():
    sc = TokenGramScanner(["a b", "c"])
    rows, starts, ends, pids = sc.scan_frame(pd.Series([None, "a b", "z", "c c"]))
    out = list(zip(rows.tolist(), starts.tolist(), ends.tolist(), pids.tolist()))
    assert out == [(1, 0, 2, 0), (3, 0, 1, 1), (3, 1, 2, 1)]


def test_scanner_hash_path_verifies_candidates(monkeypatch):
    # Force the non-exact (hashed+verified) encoding: results identical.
    pats = ["a b c", "b c a", "c a b", "a", "b c"]
    sc = TokenGramScanner(pats)
    monkeypatch.setattr(TokenGramScanner, "_EXACT_LIMIT", 0)
    sc_h = TokenGramScanner(pats)
    assert not any(sc_h._exact.values())
    text = pd.Series(["a b c a b c a", "", "b c b c a"])
    exact_out = [tuple(int(v) for v in t) for t in zip(*sc.scan_frame(text))]
    hash_out = [tuple(int(v) for v in t) for t in zip(*sc_h.scan_frame(text))]
    assert exact_out == hash_out and exact_out


def test_scanner_hash_path_fuzz(monkeypatch):
    monkeypatch.setattr(TokenGramScanner, "_EXACT_LIMIT", 0)
    rng = random.Random(7)
    alphabet = [f"w{i}" for i in range(6)]
    for _ in range(25):
        pats = list({
            " ".join(rng.choice(alphabet) for _ in range(rng.randint(1, 3)))
            for _ in range(rng.randint(1, 8))
        })
        sc = TokenGramScanner(pats)
        text = " ".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        got = [tuple(int(v) for v in t) for t in zip(*sc.scan_frame(pd.Series([text])))]
        ac = AhoCorasick({p: i for i, p in enumerate(pats)})
        toks = text.split(" ") if text else []
        want = [(0, s, e, p) for s, e, p in ac.find_longest(toks)]
        assert got == want
