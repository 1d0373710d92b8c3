"""Vectorized multi-pattern mention scanner (Arrow tokenize + numpy n-grams).

Replaces the per-token Python loop of the Aho-Corasick pass in
``operators.extract.detect_mentions`` — the last row-at-a-time hot loop
in the engine — with batch C-level work. Semantics are pinned identical
to ``functions.ahocorasick.AhoCorasick.find_longest`` (the executable
spec, kept for tests): token-boundary matches, longest-leftmost
non-overlapping resolution, mirroring the reference's substitution scan
(`webnlg_eval_scripts/webnlg_baseline_input.py:68-97`).

How it vectorizes — the key is that no token ever becomes a PyObject:

1. Texts stay in Arrow: ``pc.split_pattern`` tokenizes every batch text
   in one C pass over the native string buffer, ``pc.list_flatten``
   gives one flat token array with per-doc offsets.
2. ``pc.index_in`` maps tokens to integer ids against the pattern-token
   vocabulary with one Arrow hash-table probe per token (exact string
   match, C-side); out-of-vocabulary tokens become -1 and can never
   participate in a match.
3. Patterns are grouped by token length L. For each L, every length-L
   text window is encoded to one uint64 key by base-(V+2) positional
   encoding (exact/injective while (V+2)**L < 2**63, which covers any
   realistic alias token vocab × alias length; otherwise a wrapping
   multiplier hash with explicit candidate verification). Window keys
   probe the sorted pattern-key array with ``np.searchsorted`` — no
   sort of the window array, all C.
4. Only the surviving candidates (sparse: real mentions) reach Python,
   for the greedy longest-leftmost sweep — per-match work, never
   per-token.

Scale notes: the scanner is built once per executor from broadcast
constants; per-batch cost is O(total_tokens × max_pattern_len) C
vector ops with zero Python-level token iteration. At a million-surface
alias dictionary the vocabulary hash table and per-length key arrays
stay a few hundred MB — the same order as the AC trie they replace —
and per-window probing is log|patterns| (searchsorted).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WRAP = np.uint64(0xFFFFFFFFFFFFFFFF)
_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant

_EMPTY = (
    np.empty(0, np.int64),
    np.empty(0, np.int64),
    np.empty(0, np.int64),
    np.empty(0, np.int64),
)


class TokenGramScanner:
    """Token n-gram matcher with AhoCorasick.find_longest semantics.

    patterns: token-joined surface strings; pattern id = list position.
    Distinct surfaces ⇒ distinct token sequences, so a (start, length)
    collision between two patterns is impossible (same invariant the AC
    automaton relies on).
    """

    # exact base-encoding is used while base**L stays below this bound;
    # class attribute so tests can force the hashed+verified path.
    _EXACT_LIMIT = 2 ** 63

    def __init__(self, patterns: list[str]):
        tok_seqs = [p.split(" ") for p in patterns]
        vocab = sorted({t for seq in tok_seqs for t in seq})
        self._tok2id = {t: i for i, t in enumerate(vocab)}
        self._vocab_pa = pa.array(vocab, type=pa.string())
        v = len(vocab)
        base = v + 2
        self._base = np.uint64(base)
        # by length: key -> [(pid, tok_id_tuple)] (list only on hash collision)
        self._by_len: dict[int, dict[int, list[tuple[int, tuple[int, ...]]]]] = {}
        self._exact: dict[int, bool] = {}
        for pid, seq in enumerate(tok_seqs):
            ids = tuple(self._tok2id[t] for t in seq)
            length = len(ids)
            if length not in self._by_len:
                self._by_len[length] = {}
                self._exact[length] = base ** length < self._EXACT_LIMIT
            key = self._encode(ids, exact=self._exact[length])
            self._by_len[length].setdefault(key, []).append((pid, ids))
        # sorted key array + aligned pid array per length: candidate keys
        # map to pids with one vectorized searchsorted (no per-candidate
        # dict probes). Hash collisions (non-exact mode only) keep the
        # dict fallback with explicit verification.
        self._keys_arr: dict[int, np.ndarray] = {}
        self._pids_arr: dict[int, np.ndarray] = {}
        self._collided: dict[int, bool] = {}
        # per length: bool mask over vocab ids — True where a pattern of
        # that length STARTS with this token. Windows are only keyed at
        # positions passing this mask, so per-length work scales with
        # the (sparse) density of plausible mention starts, not tokens.
        self._first_ok: dict[int, np.ndarray] = {}
        for length, d in self._by_len.items():
            keys = np.fromiter(d.keys(), dtype=np.uint64, count=len(d))
            order = np.argsort(keys)
            self._keys_arr[length] = keys[order]
            first_pids = np.fromiter(
                (entries[0][0] for entries in d.values()), dtype=np.int64, count=len(d)
            )
            self._pids_arr[length] = first_pids[order]
            self._collided[length] = any(len(e) > 1 for e in d.values())
            first_ok = np.zeros(v, dtype=bool)
            for entries in d.values():
                for _pid, seq in entries:
                    first_ok[seq[0]] = True
            self._first_ok[length] = first_ok
        # The tuple maps are only read on the verification path (hashed
        # or collided keys). In the exact, collision-free production
        # regime the numpy arrays fully answer membership — drop the
        # per-pattern PyObject tuples there, which at a million-surface
        # dictionary would otherwise hold O(100 MB) per executor for
        # nothing.
        self._lengths: list[int] = sorted(self._by_len)
        self._by_len = {
            length: d
            for length, d in self._by_len.items()
            if not self._exact[length] or self._collided[length]
        }

    def _encode(self, ids: tuple[int, ...], exact: bool) -> int:
        key = 0
        if exact:
            for i in ids:
                key = key * int(self._base) + (i + 1)
            return key
        for i in ids:
            key = (key * int(_HASH_MULT) + (i + 1)) & int(_WRAP)
        return key

    # ------------------------------------------------------------ scan
    def scan_frame(
        self, texts: pd.Series
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """pandas entry point: one PyObject→Arrow hop per DOC, then C."""
        return self.scan_arrow(pa.Array.from_pandas(texts.astype(object)))

    def scan_arrow(
        self, texts: pa.Array | pa.ChunkedArray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Scan a batch of texts held as an Arrow string array.

        Returns (row, tok_start, tok_end, pattern_id) int64 arrays; `row`
        indexes into `texts` positionally. Per doc, matches come out in
        greedy longest-leftmost order (start ascending) — exactly
        ``AhoCorasick.find_longest``.
        """
        if not self._lengths or len(texts) == 0:
            return _EMPTY
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        arr = pc.fill_null(texts, "")
        nonempty = pc.not_equal(arr, "").to_numpy(zero_copy_only=False)
        orig_rows = np.nonzero(nonempty)[0]
        if len(orig_rows) == 0:
            return _EMPTY
        sub = arr.filter(pa.array(nonempty))
        toks = pc.split_pattern(sub, pattern=" ")
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks)
        n = len(flat)
        ids = (
            pc.fill_null(pc.index_in(flat, value_set=self._vocab_pa), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        doc_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
        doc_order = np.repeat(np.arange(len(lens)), lens)
        local_pos = np.arange(n) - doc_start[doc_order]

        cand_chunks: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
        uids = (ids + 1).astype(np.uint64)  # unknown (-1) -> 0, never in any key
        vocab_pos = np.nonzero(ids >= 0)[0]  # only in-vocab tokens can start
        if len(vocab_pos) == 0:
            return _EMPTY
        vocab_ids = ids[vocab_pos]
        for length in self._lengths:
            if n < length:
                continue
            exact = self._exact[length]
            mult = self._base if exact else _HASH_MULT
            # sparse window starts: in-vocab AND a valid first token for
            # this pattern length AND room for the window in the batch
            p0 = vocab_pos[self._first_ok[length][vocab_ids]]
            if length > 1:
                p0 = p0[p0 <= n - length]
            if len(p0) == 0:
                continue
            key = uids[p0]  # fancy indexing: already a fresh array
            valid = np.ones(len(p0), dtype=bool)
            for j in range(1, length):
                nxt = uids[p0 + j]
                key = key * mult + nxt
                valid &= ids[p0 + j] >= 0
            if length > 1:
                valid &= doc_order[p0] == doc_order[p0 + length - 1]
            keys_sorted = self._keys_arr[length]
            # membership via searchsorted on the (small) pattern keys:
            # no O(m log m) sort of the window array (np.isin would)
            ins = np.searchsorted(keys_sorted, key)
            ins[ins == len(keys_sorted)] = 0
            hit = valid & (keys_sorted[ins] == key)
            sel_c = np.nonzero(hit)[0]
            if len(sel_c) == 0:
                continue
            pos = p0[sel_c]
            pids = self._pids_arr[length][ins[sel_c]]
            if not exact or self._collided[length]:
                # hashed keys may collide: verify each candidate's token
                # ids against the pattern(s) behind its key (rare path;
                # _by_len retains exactly these lengths)
                keymap = self._by_len[length]
                keep = np.ones(len(pos), dtype=bool)
                pids = pids.copy()
                cand_keys = key[sel_c]
                for c, p in enumerate(pos.tolist()):
                    window = tuple(int(x) for x in ids[p : p + length])
                    for pid, seq in keymap[int(cand_keys[c])]:
                        if window == seq:
                            pids[c] = pid
                            break
                    else:
                        keep[c] = False
                pos, pids = pos[keep], pids[keep]
                if len(pos) == 0:
                    continue
            cand_chunks.append(
                (doc_order[pos], local_pos[pos],
                 np.full(len(pos), length, np.int64), pids)
            )
        if not cand_chunks:
            return _EMPTY
        docs = np.concatenate([c[0] for c in cand_chunks])
        starts = np.concatenate([c[1] for c in cand_chunks])
        lengths = np.concatenate([c[2] for c in cand_chunks])
        pids = np.concatenate([c[3] for c in cand_chunks])
        order = np.lexsort((-lengths, starts, docs))
        docs_l, starts_l, lens_l = docs.tolist(), starts.tolist(), lengths.tolist()
        sel = []
        cur_doc, cursor = -1, 0
        for i in order.tolist():  # per-CANDIDATE loop: sparse, never per-token
            d, st = docs_l[i], starts_l[i]
            if d != cur_doc:
                cur_doc, cursor = d, 0
            if st >= cursor:
                sel.append(i)
                cursor = st + lens_l[i]
        sel_arr = np.asarray(sel, np.int64)
        return (
            orig_rows[docs[sel_arr]],
            starts[sel_arr],
            starts[sel_arr] + lengths[sel_arr],
            pids[sel_arr],
        )
