"""Byte-identical text normalization (BASELINE.json per-row invariant).

The plain-Python functions must equal the reference chain
(webnlg_gcnonmt_input.py:184-187,200-201) literally, and the vectorized
pandas versions must equal the plain-Python ones on arbitrary input.
"""

import re

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_to_text_spark.functions.textnorm import (
    _clean_surface_series,
    _normalize_series,
    clean_surface,
    extract_text_py,
    normalize,
    squeeze,
    tokenize,
)


def _reference_chain(s: str) -> str:
    """Literal reimplementation of the reference's normalization."""
    out = " ".join(re.split("(\\W)", s))  # webnlg_gcnonmt_input.py:186
    return " ".join(out.split())  # webnlg_gcnonmt_input.py:200


def _reference_surface(s: str) -> str:
    """webnlg_baseline_input.py:69,72 (subject surface chain)."""
    clean = " ".join(re.split("(\\W)", s.replace("_", " ").replace('"', "")))
    return " ".join(clean.split())


CASES = [
    "Aarhus_Airport",
    '"25.0"(gramPerCubicCentimetres)',
    "( 19255 ) 1994 VK8 | density | 2.0",
    "Ardmore_Airport_(New_Zealand)",
    "a,,b",
    ",leading and trailing,",
    "tabs\tand\nnewlines",
    "ünïcödé—dash",
    "",
    "   ",
    "25.0",
]


@pytest.mark.parametrize("s", CASES)
def test_normalize_matches_reference(s):
    assert normalize(s) == _reference_chain(s)


@pytest.mark.parametrize("s", CASES)
def test_clean_surface_matches_reference(s):
    assert clean_surface(s) == _reference_surface(s)


def test_decimal_tokenization():
    # SURVEY §1.2: numeric literals stay tokenized strings: 25.0 -> 25 . 0
    assert normalize("25.0") == "25 . 0"
    assert clean_surface("2702.0") == "2702 . 0"


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_normalize_property(s):
    assert normalize(s) == _reference_chain(s)


@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_vectorized_equals_plain(strings):
    got = _normalize_series(pd.Series(strings, dtype="object")).tolist()
    assert got == [normalize(s) for s in strings]
    got_cs = _clean_surface_series(pd.Series(strings, dtype="object")).tolist()
    assert got_cs == [clean_surface(s) for s in strings]


def test_tokenize_and_squeeze_compose():
    s = "building | location | New_York City"
    assert normalize(s) == squeeze(tokenize(s))


def test_extract_text_roundtrip():
    text = "Aarhus Airport serves the city of Aarhus ."
    html = b"<html><body><p>" + text.encode() + b"</p></body></html>"
    assert extract_text_py(html) == text
