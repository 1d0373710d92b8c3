"""rdf_to_text_spark — a PySpark-native knowledge-graph construction engine.

Inverts the verbalization pipeline of the reference repo
(``Nicoleqwerty/RDF-to-Text``, IJCAI 2020): where the reference turns
(subj, pred, obj) triples into English text via delexicalized templates
(``webnlg_eval_scripts/webnlg_baseline_input.py:38-104`` delex,
``:191-238`` relex), this engine turns web text back into canonical
triples:

    pages (url, warc_ts, html, text, lang)
      → text extraction (byte-identical normalization, SURVEY.md P3-P5)
      → mention detection (Aho-Corasick over a broadcast alias dict, P6 inverted)
      → template pattern matching (the reference's delex pairs, inverted)
      → entity linking (exact / lowercase / paren-stripped ladder +
        TF-IDF cosine rerank, webnlg_baseline_input.py:84-95 inverted)
      → canonicalization (first-token clustering build_dataset.py:226-246,
        generalized to join-based connected components)
      → graph materialize (entity + edge tables, idempotent MERGE semantics)

Everything is DataFrame-first; per-row text work runs in Arrow-batched
pandas UDFs (never row-at-a-time Python UDFs).
"""

__version__ = "0.1.0"
