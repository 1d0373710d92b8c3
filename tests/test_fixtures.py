"""Fixture contract: determinism, relex semantics, alias uniqueness."""

from rdf_to_text_spark.fixtures import gold_triples_py, render_page_py
from rdf_to_text_spark.functions.textnorm import clean_surface
from rdf_to_text_spark.templates import (
    ENTITIES,
    OBJ_POOLS,
    TEMPLATES,
    build_alias_index,
    surface_variants,
)


def test_render_is_deterministic():
    a, b = render_page_py(123), render_page_py(123)
    assert a == b


def test_render_relex_semantics():
    """Slot replacement mirrors webnlg_baseline_input.py:191-211:
    'KEY ' -> 'surface ' in sorted key order."""
    p = render_page_py(1)
    assert "ENTITIES_" not in p["text"]
    for d in range(100):
        assert "ENTITIES_" not in render_page_py(d)["text"]


def test_gold_matches_sentence_count():
    p = render_page_py(7)
    n_sent = 1 + 7 % 3
    assert len(p["text"].split(" . ")) == n_sent
    assert len(p["gold"]) <= n_sent


def test_lang_split():
    assert render_page_py(0)["lang"] == "xx"
    assert render_page_py(20)["lang"] == "xx"
    assert render_page_py(1)["lang"] == "en"
    # xx docs contribute no gold triples
    assert all(d % 20 != 0 for (d, *_rest) in gold_triples_py(range(100)))


def test_variant_surfaces_unambiguous():
    """Every surface a subject can render with must link back to exactly
    one canonical entity (gold-path requirement)."""
    seen: dict[str, str] = {}
    for cat, names in ENTITIES.items():
        for name in names:
            for v in surface_variants(name):
                assert seen.setdefault(v, name) == name, f"ambiguous surface {v!r}"
    for pool, names in OBJ_POOLS.items():
        for name in names:
            s = clean_surface(name)
            assert seen.setdefault(s, name) == name, f"ambiguous obj surface {s!r}"


def test_alias_index_covers_all_render_surfaces():
    idx = build_alias_index()
    for cat, names in ENTITIES.items():
        for name in names:
            for v in surface_variants(name):
                assert v in idx and idx[v][0] == name
    for pool, names in OBJ_POOLS.items():
        for name in names:
            assert clean_surface(name) in idx


def test_no_period_tokens_in_surfaces():
    """Sentence segmentation splits on ' . ' — no surface may contain it."""
    for names in list(ENTITIES.values()) + list(OBJ_POOLS.values()):
        for name in names:
            assert " . " not in clean_surface(name) + " "
    for pred, cat, opool, pattern in TEMPLATES:
        assert " . " not in pattern[:-2]
    from rdf_to_text_spark.templates import FILLERS

    for f in FILLERS:
        assert " . " not in f and not f.endswith(".")


def test_templates_paraphrase_and_prefix_requirements():
    """FIXTURES.md §3: ≥3 predicates with multiple paraphrases; ≥2
    templates sharing a surface prefix."""
    from collections import Counter

    pred_counts = Counter(p for p, *_ in TEMPLATES)
    assert sum(1 for c in pred_counts.values() if c >= 2) >= 3
    pats = [t[3] for t in TEMPLATES]
    assert any(
        a != b and b.startswith(a[: a.index("ENTITIES_2")])
        for a in pats
        for b in pats
        if "ENTITIES_2" in a
    )
