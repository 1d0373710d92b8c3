"""robots.txt parsing + crawl-politeness gating (RFC 9309).

The first gate of any crawl pipeline: before a page is fetched (or, in
re-processing, before a captured url is admitted), its path must pass
the host's robots.txt rules for the crawler's user-agent. This module
keeps the whole decision DECLARATIVE on the Spark side:

  * :func:`parse_robots_py` — plain-Python RFC 9309 group parser (the
    unit-testable spec; stdlib only);
  * :func:`robots_rules`   — (host, robots_txt) → exploded rules table,
    each rule pre-compiled to a SQL ``LIKE`` pattern so matching stays
    engine-side (whole-stage codegen), never per-row Python;
  * :func:`robots_gate`    — urls × rules → per-url allow/deny with the
    winning rule, per RFC 9309 precedence (longest path wins, tie →
    Allow; no match / no group → allowed).

Semantics implemented (public spec, RFC 9309 §2):
  * groups = consecutive ``User-agent`` lines + their Allow/Disallow
    rules; a later ``User-agent`` after rules starts a new group;
  * agent resolution: a host that has a group for the crawler's exact
    product token (case-insensitive) uses ONLY those rules; otherwise
    the ``*`` group applies (substring-prefix agent matching is a
    documented simplification — exact-or-star covers the fixture and
    the overwhelmingly common real-world layout);
  * ``*`` in a path matches any run of octets; a TRAILING ``$`` anchors
    the match at the end; an empty Disallow matches nothing;
  * rule precedence: longest raw path string first (octet length, the
    RFC's specificity), Allow beating Disallow on equal length.

Scale shape: robots.txt bodies are per-host and tiny, so the rules
table is dimension-sized → broadcast-joined against the url frame. The
gate computes decisions per DISTINCT (host, target) then joins back:
one combiner-friendly aggregate + one join, both keyed on the target —
re-captures of a url (the normal crawl case) pay the match once.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def parse_robots_py(text: str) -> list[tuple[str, bool, str]]:
    """robots.txt body → [(agent, allow, path)] in file order.

    RFC 9309 line grammar: ``key: value`` with ``#`` comments; keys
    case-insensitive. Rules seen before any User-agent line have no
    group and are dropped; empty rule paths match nothing and are
    dropped; unknown keys (Sitemap, Crawl-delay, ...) are ignored.
    """
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_rules = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, in_rules = [], [], False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if not cur_agents:
                continue
            in_rules = True
            if val:
                cur_rules.append((key == "allow", val))
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    out = []
    for agents, rules in groups:
        for agent in agents:
            for allow, path in rules:
                out.append((agent, allow, path))
    return out


def to_like_pattern(path: str) -> str:
    """Compile a robots path to a SQL LIKE pattern (ESCAPE ``\\``):
    LIKE metachars escaped, ``*`` → ``%``, trailing ``$`` drops the
    implicit suffix wildcard. ``$`` anywhere else is a literal."""
    anchored = path.endswith("$")
    body = path[:-1] if anchored else path
    esc = body.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    pat = esc.replace("*", "%")
    return pat if anchored else pat + "%"


RULES_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("agent", StringType()),
        StructField("rule_idx", LongType()),
        StructField("allow", BooleanType()),
        StructField("path", StringType()),
        StructField("like_pat", StringType()),
        StructField("rule_len", IntegerType()),
    ]
)


def robots_rules(robots: DataFrame) -> DataFrame:
    """(host, robots_txt) → exploded, LIKE-compiled rules table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, text in zip(pdf["host"], pdf["robots_txt"]):
                for i, (agent, allow, path) in enumerate(parse_robots_py(text)):
                    rows.append(
                        (
                            host,
                            agent,
                            i,
                            allow,
                            path,
                            to_like_pattern(path),
                            len(path),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in RULES_SCHEMA.fields])

    return robots.mapInPandas(gen, RULES_SCHEMA)


def robots_gate(
    urls: DataFrame, rules: DataFrame, agent: str, url_col: str = "url"
) -> DataFrame:
    """urls × rules → urls + ``allowed`` boolean + ``rule_path`` (the
    winning rule's raw path, NULL when no rule matched).

    The match target is ``path[?query]`` of the url, empty path
    defaulting to ``/`` (RFC 9309 matches against path + optional
    query). Host/path/query split is JVM-side ``parse_url``; rule
    matching is engine-side ``LIKE ... ESCAPE``; the winner is one
    ``max_by`` over (rule_len, allow) — longest wins, Allow wins ties.
    """
    agent_l = agent.lower()
    exact = rules.filter(F.lower(F.col("agent")) == agent_l)
    star = rules.filter(F.col("agent") == "*").join(
        exact.select("host").distinct(), "host", "left_anti"
    )
    applicable = exact.unionByName(star)

    host = F.lower(F.expr(f"parse_url({url_col}, 'HOST')"))
    path = F.expr(f"parse_url({url_col}, 'PATH')")
    query = F.expr(f"parse_url({url_col}, 'QUERY')")
    target = F.concat(
        F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path),
        F.when(query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    u = urls.withColumn("_host", host).withColumn("_target", target)

    decisions = (
        u.select("_host", "_target")
        .distinct()
        .join(F.broadcast(applicable), u["_host"] == applicable["host"])
        .filter(F.expr("_target LIKE like_pat ESCAPE '\\\\'"))
        .groupBy("_host", "_target")
        .agg(
            F.max_by(
                F.struct(F.col("allow"), F.col("path")),
                F.struct(F.col("rule_len"), F.col("allow").cast("int")),
            ).alias("_win")
        )
    )
    return (
        u.join(decisions, ["_host", "_target"], "left")
        .withColumn("allowed", F.coalesce(F.col("_win.allow"), F.lit(True)))
        .withColumn("rule_path", F.col("_win.path"))
        .drop("_host", "_target", "_win")
    )
