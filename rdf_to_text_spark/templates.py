"""Template bank + alias dictionary (the inverted verbalization assets).

The reference ships frozen delexicalized template pairs
(`data/preprocess_input/test-webnlg-all-delex.{triple,lex}`, e.g.
source ``ENTITIES_1 PLACE ... | cityServed | ENTITIES_2 PLACE CITY``,
target ``ENTITIES_1 serves the city of ENTITIES_2 .``) and a category →
entity dictionary (`webnlg_eval_scripts/delex_dict.json`). Our engine
inverts them: each lex template becomes an extraction pattern whose
slots recover (subj, pred, obj); the dictionary becomes the
entity-linking build side.

Everything here is a deterministic, self-contained fixture (no data is
copied from the reference; names are synthetic). These constants are
the single source of truth for:
  * the synthetic page renderer (fixtures.py) — reference relex
    semantics, webnlg_baseline_input.py:191-211;
  * the extractor's pattern bank (operators/extract.py);
  * the generated DuckDB oracle SQL (fixtures.py:gold_triples_sql).
"""

from __future__ import annotations

from .functions.textnorm import clean_surface

# --------------------------------------------------------------- entities
# category -> list of canonical (underscored) entity names. Index order is
# load-bearing: the renderer and the SQL oracle address entities by index.
ENTITIES: dict[str, list[str]] = {
    "Airport": [
        "Aarhus_Airport",                      # head entity (Zipf skew target)
        "Ashgabat_International_Airport",
        "Ardmore_Airport_(New_Zealand)",       # paren variant exercises the ladder
        "Belfort_Chaux_Airfield",
        "Cazaux_Air_Base",
        "Dublin_Meadow_Airport",
        "Elko_Regional_Airport",
        "Fallon_Municipal_Airport",
    ],
    "Artist": [
        "Aaron_Deer",
        "Abra_Moore",
        "Alfred_Garth_Jones",
        "Andra_(singer)",
        "Boden_Trio",
        "Clara_Vandermost",
        "Dexter_Holloway",
        "Elis_Margaux",
    ],
    "City": [
        "Aarhus",
        "Antwerp",
        "Austin_(Texas)",
        "Bandung",
        "Cologne",
        "Darlington",
        "Evanston_(Illinois)",
        "Fredrikstad",
        "Giessen",
        "Hamilton_(Ohio)",
    ],
    "Food": [
        "Ajoblanco",
        "Bacon_Explosion",
        "Binignit",
        "Corn_Chowder",
        "Dumpling_Stew",
        "Escarole_Soup",
    ],
}

# Non-subject object pools (entity-like and literal-like).
OBJ_POOLS: dict[str, list[str]] = {
    "City": ENTITIES["City"],
    "Airport": ENTITIES["Airport"],
    "Country": ["Denmark", "Romania", "Indonesia", "Germany", "Norway", "United_States"],
    "RecordLabel": ["Kill_Rock_Stars", "Arista_Records", "Polydor_Records", "Sub_Pop"],
    "Genre": ["Indie_rock", "Folk_music", "Electronica"],
    "Operator": ["Aarhus_Lufthavn_A/S", "Turkmenistan_Airlines", "United_States_Air_Force"],
    "Ingredient": ["Almonds", "Bread", "Garlic", "Coconut_milk", "Sweet_potato", "Celery"],
    "Region": ["Andalusia", "Visayas", "New_England", "Kansas_City_metro_area"],
    "Course": ["Appetizer", "Main_course", "Dessert"],
    # integers only: a '.' inside a literal would collide with the sentence
    # terminal in token space (decimal tokenization itself is covered by
    # textnorm unit tests, e.g. '25.0' -> '25 . 0')
    "RunwayLen": ["2702", "2776", "900", "1533"],
    "Year": ["1994", "2003", "2010"],
    "Population": ["226410", "520504", "1212000"],
}

# --------------------------------------------------------------- templates
# (pred, subject_category, object_pool, pattern). Patterns use the
# reference's slot convention (ENTITIES_1 = subject, ENTITIES_2 = object)
# and are already in normalized token space (single spaces, ' .' ending).
TEMPLATES: list[tuple[str, str, str, str]] = [
    # Airport ------------------------------------------------------------
    ("cityServed", "Airport", "City", "ENTITIES_1 serves the city of ENTITIES_2 ."),
    ("cityServed", "Airport", "City", "ENTITIES_2 is served by ENTITIES_1 ."),
    ("cityServed", "Airport", "City", "the city ENTITIES_2 is served by ENTITIES_1 ."),
    ("cityServed", "Airport", "City", "ENTITIES_1 serves ENTITIES_2 ."),
    ("location", "Airport", "City", "ENTITIES_1 is located in ENTITIES_2 ."),
    ("location", "Airport", "City", "ENTITIES_1 is located in the city of ENTITIES_2 ."),
    ("location", "Airport", "City", "ENTITIES_1 can be found in ENTITIES_2 ."),
    ("runwayLength", "Airport", "RunwayLen", "the runway length of ENTITIES_1 is ENTITIES_2 ."),
    ("runwayLength", "Airport", "RunwayLen", "ENTITIES_1 has a runway length of ENTITIES_2 ."),
    ("operatingOrganisation", "Airport", "Operator", "ENTITIES_1 is operated by ENTITIES_2 ."),
    ("operatingOrganisation", "Airport", "Operator", "the operating organisation of ENTITIES_1 is ENTITIES_2 ."),
    ("elevationAboveTheSeaLevel", "Airport", "RunwayLen", "ENTITIES_1 is ENTITIES_2 metres above sea level ."),
    # Artist -------------------------------------------------------------
    ("recordLabel", "Artist", "RecordLabel", "ENTITIES_1 is signed to the record label ENTITIES_2 ."),
    ("recordLabel", "Artist", "RecordLabel", "ENTITIES_1 has been signed to the record label ENTITIES_2 ."),
    ("recordLabel", "Artist", "RecordLabel", "the record label of ENTITIES_1 is ENTITIES_2 ."),
    ("birthPlace", "Artist", "City", "ENTITIES_1 was born in ENTITIES_2 ."),
    ("birthPlace", "Artist", "City", "ENTITIES_1 , born in ENTITIES_2 , is an artist ."),
    ("birthPlace", "Artist", "City", "born in ENTITIES_2 , ENTITIES_1 is a performer ."),
    ("genre", "Artist", "Genre", "ENTITIES_1 performs ENTITIES_2 music ."),
    ("genre", "Artist", "Genre", "the musical genre of ENTITIES_1 is ENTITIES_2 ."),
    ("activeYearsStartYear", "Artist", "Year", "ENTITIES_1 became active in ENTITIES_2 ."),
    # City ---------------------------------------------------------------
    ("country", "City", "Country", "ENTITIES_1 is in the country of ENTITIES_2 ."),
    ("country", "City", "Country", "ENTITIES_1 is a city in ENTITIES_2 ."),
    ("country", "City", "Country", "the country of ENTITIES_1 is ENTITIES_2 ."),
    ("isPartOf", "City", "Region", "ENTITIES_1 is part of ENTITIES_2 ."),
    ("isPartOf", "City", "Region", "ENTITIES_1 belongs to the ENTITIES_2 region ."),
    ("populationTotal", "City", "Population", "the total population of ENTITIES_1 is ENTITIES_2 ."),
    # Food ---------------------------------------------------------------
    ("ingredient", "Food", "Ingredient", "ENTITIES_2 is an ingredient of ENTITIES_1 ."),
    ("ingredient", "Food", "Ingredient", "ENTITIES_1 contains ENTITIES_2 ."),
    ("ingredient", "Food", "Ingredient", "one of the ingredients of ENTITIES_1 is ENTITIES_2 ."),
    ("region", "Food", "Region", "ENTITIES_1 comes from the ENTITIES_2 region ."),
    ("region", "Food", "Region", "ENTITIES_1 is a dish from ENTITIES_2 ."),
    ("course", "Food", "Course", "ENTITIES_1 is served as a ENTITIES_2 ."),
]

# Filler sentences (negatives — no triple). Token space, no '.', no overlap
# with any alias surface.
FILLERS: list[str] = [
    "the weather report was updated this morning",
    "several visitors arrived later than expected",
    "nothing notable happened during the afternoon",
    "the committee will meet again next week",
    "local traffic was heavier than usual",
]


def surface_variants(canonical: str) -> list[str]:
    """Ordered alias-surface ladder for one canonical entity.

    variants[0] is the clean canonical surface; then lowercase; then the
    paren-stripped prefix — mirroring the fallback-match ladder of
    webnlg_baseline_input.py:84-95. Deduplicated preserving order.
    """
    base = clean_surface(canonical)
    cands = [base, base.lower(), base.split("(")[0].strip()]
    out: list[str] = []
    for c in cands:
        if c and c not in out:
            out.append(c)
    return out


# Pools whose members are numeric literals, not linkable entities.
_LITERAL_POOLS = frozenset({"RunwayLen", "Year", "Population"})


def entity_like_names() -> list[str]:
    """Every canonical name that denotes an entity (subjects + the
    entity-like object pools; numeric-literal pools excluded), deduped
    and sorted — the KB node set entity linking targets."""
    seen: set[str] = set()
    for names in ENTITIES.values():
        seen.update(names)
    for pool, names in OBJ_POOLS.items():
        if pool not in _LITERAL_POOLS:
            seen.update(names)
    return sorted(seen)


def first_token_candidates() -> list[tuple[str, str]]:
    """(mention, entity) pairs where mention = lowercased FIRST TOKEN of
    the clean surface — the sloppy anchor-text alias real crawls carry.

    Deliberately ambiguous: 'aarhus' maps to the city (Aarhus), the
    airport (Aarhus_Airport) and the operator (Aarhus_Lufthavn_A/S);
    context-free lexicographic choice picks a decoy, so a reranker
    needs an external signal (the co-occurrence prior) to resolve it.
    Dictionary-sized by construction (one row per (first-token, entity)
    pair over the KB) — the broadcast build side of kg_link_prior and
    the VALUES CTE of its generated DuckDB oracle."""
    pairs = {
        (clean_surface(name).split()[0].lower(), name)
        for name in entity_like_names()
    }
    return sorted(pairs)


def build_alias_index() -> dict[str, tuple[str, str]]:
    """surface -> (canonical, category/pool). Covers subjects and objects."""
    idx: dict[str, tuple[str, str]] = {}
    for cat, names in ENTITIES.items():
        for name in names:
            for v in surface_variants(name):
                idx.setdefault(v, (name, cat))
    for pool, names in OBJ_POOLS.items():
        if pool in ("City", "Airport"):
            continue  # already indexed under their category
        for name in names:
            for v in surface_variants(name):
                idx.setdefault(v, (name, pool))
    return idx
