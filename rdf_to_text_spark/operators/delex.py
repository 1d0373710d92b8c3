"""Forward delexicalisation / relexicalisation (reference parity ops).

These are the reference's own preprocessing operators, re-expressed for
Spark so a user of the reference could run the *forward* direction too:

  * :func:`delexicalise_py` — literal semantics of
    `webnlg_eval_scripts/webnlg_baseline_input.py:38-104`: replace
    entity surfaces by ``ENTITIES_k`` masks in a (src, trg) pair,
    returning the replacement dict. Preserves every quirk: the
    whole-field membership gate on the source (:67-70), the
    conditional vs unconditional ``ent_cnt`` increments (subject loop
    :76-78 vs object loop :97), the sorted property iteration (:82),
    and the lowercase / paren-stripped fallback matches on the target
    (:90-95).
  * :func:`relexicalise_py` — inverse substitution in sorted key order
    (`webnlg_baseline_input.py:209-211`).
  * :func:`delexicalise` / :func:`relexicalise` — Arrow-batched Spark
    operators applying the same functions per row (the per-row loop is
    inherent to the reference's sequential replace semantics; batches
    amortize it and the dictionaries are process-local, fixing the
    per-example JSON re-read at :47-52).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..templates import ENTITIES


def delexicalise_py(
    out_src: str,
    out_trg: str,
    category: str,
    properties_objects: dict[str, str],
    delex_dict: dict[str, list[str]] | None = None,
) -> tuple[str, str, dict[str, str]]:
    """Reference delexicalisation semantics (see module docstring).

    Inputs are already tokenized (normalize chain applied); the
    dictionary defaults to the engine's entity table in the reference's
    category → [underscored names] shape.
    """
    data = delex_dict if delex_dict is not None else ENTITIES
    delex_subj = data.get(category, [])
    delex_src, delex_trg = out_src, out_trg
    replcments: dict[str, str] = {}
    ent_cnt = 1

    # subject pass — webnlg_baseline_input.py:67-78
    out_src_list = [x.strip() for x in out_src.strip().replace("< TSP >", "|").split(" | ")]
    for subject in delex_subj:
        clean_subj = " ".join(re.split(r"(\W)", subject.replace("_", " ")))
        if clean_subj in out_src and clean_subj in out_src_list:
            delex_src = out_src.replace(
                clean_subj + " ", "ENTITIES_" + str(ent_cnt) + " " + category.upper() + " "
            )
            replcments["ENTITIES_" + str(ent_cnt)] = " ".join(clean_subj.split())
        if clean_subj in out_trg:
            delex_trg = out_trg.replace(clean_subj + " ", "ENTITIES_" + str(ent_cnt) + " ")
            replcments["ENTITIES_" + str(ent_cnt)] = " ".join(clean_subj.split())
        if (clean_subj in out_src and clean_subj in out_src_list) or clean_subj in out_trg:
            ent_cnt += 1

    # object pass — webnlg_baseline_input.py:80-97 (sorted; unconditional ++)
    delex_src_list = [x.strip() for x in delex_src.strip().replace("< TSP >", "|").split(" | ")]
    for pro, obj in sorted(properties_objects.items()):
        obj_clean = " ".join(re.split(r"(\W)", obj.replace("_", " ").replace('"', "")))
        if obj_clean in delex_src and obj_clean.strip() in delex_src_list:
            delex_src = delex_src.replace(
                obj_clean + " ", "ENTITIES_" + str(ent_cnt) + " " + pro.upper() + " "
            )
            replcments["ENTITIES_" + str(ent_cnt)] = " ".join(obj_clean.split())
        if obj_clean in delex_trg:
            delex_trg = delex_trg.replace(obj_clean + " ", "ENTITIES_" + str(ent_cnt) + " ")
            replcments["ENTITIES_" + str(ent_cnt)] = " ".join(obj_clean.split())
        if obj_clean.lower() in delex_trg:
            delex_trg = delex_trg.replace(
                obj_clean.lower() + " ", "ENTITIES_" + str(ent_cnt) + " "
            )
            replcments["ENTITIES_" + str(ent_cnt)] = " ".join(obj_clean.split())
        if obj_clean.split("(")[0].strip() in delex_trg:
            delex_trg = delex_trg.replace(
                obj_clean.split("(")[0].strip() + " ", "ENTITIES_" + str(ent_cnt) + " "
            )
            replcments["ENTITIES_" + str(ent_cnt)] = " ".join(obj_clean.split())
        ent_cnt += 1

    return delex_src, delex_trg, replcments


def relexicalise_py(pred: str, rplc_dict: dict[str, str]) -> str:
    """`relex_pred.replace(key + ' ', value + ' ')` in sorted key order —
    webnlg_baseline_input.py:209-211."""
    out = pred
    for key in sorted(rplc_dict):
        out = out.replace(key + " ", rplc_dict[key] + " ")
    return out


def ent_unmask_py(line: str, pairs: list[tuple[str, str]]) -> str:
    """P8 typed-mask relexicalisation — literal semantics of the
    reference's `data/translate_result/ent_unmask.py:44-56`:

      * dict(mask → surface) built in PAIR ORDER (:46-50; a later pair
        with the same mask OVERWRITES the surface, and first-insertion
        order — not sorted order — drives the replacement sequence);
      * `line.replace(k.lower(), v.lower())` per entry (:52-53) — plain
        substring replace, no space guard (unlike `relexicalise_py`);
      * re-tokenize `' '.join(re.split('(\\W)', line))` then the exact
        space-collapse chain `'    '→' '`, `'   '→' '`, `'  '→' '`,
        `.strip()`, final `.lower()` (:54-55).
    """
    dct: dict[str, str] = {}
    for mask, surface in pairs:
        dct[mask] = surface
    for k, v in dct.items():
        line = line.replace(k.lower(), v.lower())
    line = (
        " ".join(re.split(r"(\W)", line))
        .replace("    ", " ")
        .replace("   ", " ")
        .replace("  ", " ")
        .strip()
    )
    return line.lower()


def ent_unmask_pkl_py(line: str, ex: list[list[tuple[str, str]]]) -> str:
    """`ent_unmask.py` dict construction from the pkl shape: `ex` is a
    list of triples, each triple three (surface, mask) pairs
    (`dct[tri[j][1]] = tri[j][0]`, j = 0,1,2 — ent_unmask.py:47-50)."""
    pairs = [(tri[j][1], tri[j][0]) for tri in ex for j in range(3)]
    return ent_unmask_py(line, pairs)


def ent_unmask(
    preds: DataFrame, pred_col: str = "pred_text", pairs_col: str = "pairs"
) -> DataFrame:
    """preds(..., pred_text, pairs: array<struct<mask,surface>>) →
    + relex_text, Arrow-batched (`ent_unmask_py` per row; the sequential
    replace chain is inherent to the reference semantics, batches
    amortize the Python entry)."""
    out_schema = StructType(
        list(preds.schema.fields) + [StructField("relex_text", StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["relex_text"] = [
                ent_unmask_py(
                    line,
                    [
                        (p["mask"], p["surface"])
                        if isinstance(p, dict)
                        else (p[0], p[1])
                        for p in (pairs if pairs is not None else [])
                    ],
                )
                for line, pairs in zip(pdf[pred_col], pdf[pairs_col])
            ]
            yield pdf

    return preds.mapInPandas(run, out_schema)


DELEX_SCHEMA = StructType(
    [
        StructField("delex_src", StringType()),
        StructField("delex_trg", StringType()),
        StructField("rplc", MapType(StringType(), StringType())),
    ]
)


def delexicalise(pairs: DataFrame, delex_dict: dict[str, list[str]] | None = None) -> DataFrame:
    """pairs(src, trg, category, props: map<string,string>) → masked pair
    + replacement dict, Arrow-batched.

    `delex_dict` (category → [underscored entity names]) defaults to the
    engine's entity table; pass the reference's delex_dict.json contents
    for frozen-artifact parity runs. The dict rides the serialized UDF
    closure — one copy per executor, no per-row JSON re-read (the
    reference re-opens the JSON file per example,
    webnlg_baseline_input.py:47-52)."""
    out_schema = StructType(list(pairs.schema.fields) + list(DELEX_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [
                delexicalise_py(s, t, c, dict(p) if p is not None else {}, delex_dict)
                for s, t, c, p in zip(pdf["src"], pdf["trg"], pdf["category"], pdf["props"])
            ]
            pdf = pdf.copy()
            pdf["delex_src"] = [r[0] for r in res]
            pdf["delex_trg"] = [r[1] for r in res]
            pdf["rplc"] = [r[2] for r in res]
            yield pdf

    return pairs.mapInPandas(run, out_schema)


def relexicalise(preds: DataFrame, pred_col: str = "pred_text", rplc_col: str = "rplc") -> DataFrame:
    """preds(..., pred_text, rplc) → + relex_text (sorted-key substitution)."""
    out_schema = StructType(list(preds.schema.fields) + [StructField("relex_text", StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["relex_text"] = [
                relexicalise_py(p, dict(r) if r is not None else {})
                for p, r in zip(pdf[pred_col], pdf[rplc_col])
            ]
            yield pdf

    return preds.mapInPandas(run, out_schema)
