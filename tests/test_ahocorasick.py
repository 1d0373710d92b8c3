from rdf_to_text_spark.functions.ahocorasick import AhoCorasick


def test_basic_matches():
    ac = AhoCorasick({"a b": 0, "b c": 1, "c": 2})
    toks = "a b c d".split()
    assert set(ac.find_all(toks)) == {(0, 2, 0), (1, 3, 1), (2, 3, 2)}


def test_longest_leftmost():
    # 'Aarhus' vs 'Aarhus Airport' share a first token (FIXTURES.md §4);
    # longest-leftmost must pick the longer surface.
    ac = AhoCorasick({"Aarhus": 0, "Aarhus Airport": 1, "Airport": 2})
    toks = "Aarhus Airport serves Aarhus".split()
    assert ac.find_longest(toks) == [(0, 2, 1), (3, 4, 0)]


def test_suffix_via_fail_links():
    ac = AhoCorasick({"b c d": 0, "c d": 1, "d": 2})
    toks = "a b c d".split()
    assert set(ac.find_all(toks)) == {(1, 4, 0), (2, 4, 1), (3, 4, 2)}
    assert ac.find_longest(toks) == [(1, 4, 0)]


def test_overlap_resolution_is_greedy_left():
    ac = AhoCorasick({"a b": 0, "b c": 1})
    toks = "a b c".split()
    # 'a b' wins the overlap; 'b c' overlaps and is dropped.
    assert ac.find_longest(toks) == [(0, 2, 0)]


def test_no_matches():
    ac = AhoCorasick({"x y": 0})
    assert ac.find_all("a b c".split()) == []
    assert ac.find_longest([]) == []


def test_repeated_pattern():
    ac = AhoCorasick({"a": 0})
    assert ac.find_all(["a", "a", "a"]) == [(0, 1, 0), (1, 2, 0), (2, 3, 0)]
