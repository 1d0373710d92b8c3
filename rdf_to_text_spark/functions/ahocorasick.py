"""Aho-Corasick multi-pattern matcher for mention detection.

The reference scans every alias of a category against each example in a
Python loop (`webnlg_eval_scripts/webnlg_baseline_input.py:68-97`) —
O(|aliases| × |text|). At web scale the alias dictionary is millions of
surfaces, so we invert the loop: one automaton pass over the text finds
all alias occurrences simultaneously. The automaton is built once per
executor from a broadcast payload and applied inside Arrow-batched
pandas UDFs.

Match policy mirrors the reference's substitution semantics:
  * matches are on token boundaries (the reference replaces
    ``surface + ' '`` in space-tokenized text, webnlg_baseline_input.py:71);
  * overlapping candidates resolve longest-leftmost (the reference's
    whole-field membership check at :67-70 prefers the full field);
  * ties (same start, same length — impossible for distinct patterns)
    cannot occur; same-start shorter matches lose.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    """Classic goto/fail/output automaton over *token lists*.

    Patterns and texts are sequences of tokens (the engine's texts are
    already space-tokenized by the normalization invariant), which makes
    boundary handling exact and keeps the alphabet small.
    """

    def __init__(self, patterns: dict[str, int]):
        """patterns: token-joined surface string -> pattern id."""
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[list[tuple[int, int]]] = [[]]  # (pattern_id, n_tokens)
        self._fail: list[int] = [0]
        for surface, pid in patterns.items():
            toks = surface.split(" ")
            state = 0
            for tok in toks:
                nxt = self._goto[state].get(tok)
                if nxt is None:
                    self._goto.append({})
                    self._out.append([])
                    self._fail.append(0)
                    nxt = len(self._goto) - 1
                    self._goto[state][tok] = nxt
                state = nxt
            self._out[state].append((pid, len(toks)))
        # BFS to build failure links; merge outputs along fail chains.
        q: deque[int] = deque()
        for state in self._goto[0].values():
            q.append(state)
        while q:
            r = q.popleft()
            for tok, s in self._goto[r].items():
                q.append(s)
                f = self._fail[r]
                while f and tok not in self._goto[f]:
                    f = self._fail[f]
                self._fail[s] = self._goto[f].get(tok, 0) if self._goto[f].get(tok, 0) != s else 0
                self._out[s] = self._out[s] + self._out[self._fail[s]]

    def find_all(self, tokens: list[str]) -> list[tuple[int, int, int]]:
        """All matches as (start_tok, end_tok_exclusive, pattern_id)."""
        res = []
        state = 0
        for i, tok in enumerate(tokens):
            while state and tok not in self._goto[state]:
                state = self._fail[state]
            state = self._goto[state].get(tok, 0)
            for pid, length in self._out[state]:
                res.append((i + 1 - length, i + 1, pid))
        return res

    def find_longest(self, tokens: list[str]) -> list[tuple[int, int, int]]:
        """Longest-leftmost non-overlapping matches.

        Sort by (start, -length); greedily take matches that start at or
        after the previous match's end.
        """
        matches = sorted(self.find_all(tokens), key=lambda m: (m[0], -(m[1] - m[0])))
        picked: list[tuple[int, int, int]] = []
        cursor = 0
        for start, end, pid in matches:
            if start >= cursor:
                picked.append((start, end, pid))
                cursor = end
        return picked
