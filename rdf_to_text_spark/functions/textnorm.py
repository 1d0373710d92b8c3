"""Byte-identical text normalization (the per-row invariant).

The reference normalizes every string through the same chain
(`webnlg_eval_scripts/webnlg_gcnonmt_input.py:184-187,200-201`):

    triples = triples.replace('_', ' ').replace('"', '')      # surfaces only
    out = ' '.join(re.split('(\\W)', s))                       # tokenize
    out = ' '.join(out.split())                                # squeeze

Our engine must reproduce this byte-for-byte per url (BASELINE.json
input_hint), so the plain-Python versions below are the source of
truth, and the Spark-side versions are vectorized pandas equivalents
proven equal in tests/test_textnorm.py. Python `re` ``\\W`` is
Unicode-aware on str — we stay in Python-regex land inside Arrow
batches and never use Spark SQL `split` (different regex engine).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_WORD_SPLIT = re.compile(r"(\W)")


# ---------------------------------------------------------------- reference
# Plain-Python reference semantics (used in tests and small driver-side code).

def tokenize(s: str) -> str:
    """`' '.join(re.split('(\\W)', s))` — webnlg_gcnonmt_input.py:186."""
    return " ".join(_WORD_SPLIT.split(s))


def squeeze(s: str) -> str:
    """`' '.join(s.split())` — webnlg_gcnonmt_input.py:200."""
    return " ".join(s.split())


def normalize(s: str) -> str:
    """Full lex-side chain: tokenize then whitespace-squeeze."""
    return squeeze(tokenize(s))


def clean_surface(s: str) -> str:
    """Entity-surface chain: underscore→space, strip quotes, tokenize, squeeze.

    Mirrors webnlg_gcnonmt_input.py:184-187 (triple side) and
    webnlg_baseline_input.py:69 (`' '.join(re.split('(\\W)',
    subject.replace('_',' ')))` + the `' '.join(x.split())` squeeze at :72).
    """
    return normalize(s.replace("_", " ").replace('"', ""))


# ---------------------------------------------------------------- vectorized
# pandas equivalents: replace each \W char c by ' c ' == join-on-space of
# re.split('(\W)') (empty split tokens contribute the same double spaces),
# then the squeeze collapses whitespace runs identically.

def _tokenize_series(s: pd.Series) -> pd.Series:
    return s.str.replace(r"(\W)", r" \1 ", regex=True)


def _squeeze_series(s: pd.Series) -> pd.Series:
    return s.str.split().str.join(" ")


def _normalize_series(s: pd.Series) -> pd.Series:
    return _squeeze_series(_tokenize_series(s.fillna("")))


def _clean_surface_series(s: pd.Series) -> pd.Series:
    return _normalize_series(
        s.fillna("").str.replace("_", " ", regex=False).str.replace('"', "", regex=False)
    )


@pandas_udf(StringType())
def normalize_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched lex normalization (tokenize + squeeze)."""
    return _normalize_series(s)


@pandas_udf(StringType())
def clean_surface_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched entity-surface normalization."""
    return _clean_surface_series(s)


_TAG = re.compile(r"<[^>]*>")


def extract_text_py(html: bytes) -> str:
    """Strip markup from an HTML payload (fixture-grade extractor).

    Real-world boilerplate removal would plug in here; the engine
    contract is only that the *normalization* after extraction is
    byte-identical, which tests pin.
    """
    return _TAG.sub(" ", html.decode("utf-8", errors="replace")).strip()


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """binary html → text, Arrow-batched."""
    decoded = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    return decoded.str.replace(r"<[^>]*>", " ", regex=True).str.strip()


def normalized(col: Column) -> Column:
    return normalize_udf(col)
