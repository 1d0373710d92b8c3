"""Graph operators: Levi-graph construction, degrees, path serialization.

Reference semantics (SURVEY.md §2.7):
  * G1/G3 `buildGraph` / `write_gcn` — per triple, edges
    ``A0: subj → pred`` and ``A1: obj → pred`` with the predicate token
    fused by '_' (`build_dataset.py:37-51`, fuse at `:44`;
    `webnlg_gcnonmt_input.py:48-83`);
  * G2 multiword NE edges — every non-head token points at the head
    token (`build_dataset.py:53-61`);
  * G6 source/sink detection — in-degree 0 / out-degree 0 node sets,
    drop example if either empty (`build_dataset.py:256-272`);
  * G7 BFS path serialization — per-example shortest paths source→sink
    (`build_dataset.py:274-288`); graphs are ≤7 edges so the BFS runs
    whole-graph inside a grouped pandas UDF (no distributed BFS
    needed — documented scale-out: iterative frontier joins).

All DataFrame-native except G7 (applyInPandas per example).
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _head(col: str, sep: str = "_") -> F.Column:
    return F.lower(F.split(F.col(col), sep).getItem(0))


def _fused(col: str) -> F.Column:
    # predicate tokens fused with '_' — build_dataset.py:44
    return F.lower(F.concat_ws("_", F.split(F.col(col), r"\s+")))


def levi_edges(
    triples: DataFrame,
    key_cols: list[str] | None = None,
    with_ne: bool = False,
) -> DataFrame:
    """(key…, node1, node2, label) Levi edges from a triples table.

    Head-token semantics of write_gcn: node1 is the first token of the
    subject/object, node2 the fused predicate. Canonical names use '_'
    as the token separator, so the head token is the first '_' part.
    """
    keys = key_cols or ["doc_id", "sent_idx"]
    a0 = triples.select(
        *keys,
        _head("subj").alias("node1"),
        _fused("pred").alias("node2"),
        F.lit("A0").alias("label"),
    )
    a1 = triples.select(
        *keys,
        _head("obj").alias("node1"),
        _fused("pred").alias("node2"),
        F.lit("A1").alias("label"),
    )
    out = a0.unionByName(a1)
    if with_ne:
        for side in ("subj", "obj"):
            toks = triples.select(
                *keys,
                F.lower(F.col(side)).alias("_full"),
                F.posexplode(F.split(F.lower(F.col(side)), "_")).alias("_pos", "node1"),
            ).filter(F.col("_pos") > 0)
            ne = toks.select(
                *keys,
                "node1",
                F.split("_full", "_").getItem(0).alias("node2"),
                F.lit("NE").alias("label"),
            )
            out = out.unionByName(ne)
    return out


def gcn_arrays(
    triples: DataFrame, example_col: str = "doc_id", order_col: str = "sent_idx"
) -> DataFrame:
    """G1/G3 `buildGraph` (webnlg_gcnonmt_input.py:49-86): per example,
    the four GCN input lines — node list, edge labels, node1 indices,
    node2 indices — as space-joined strings, byte-compatible with the
    reference's `-src-nodes/-src-labels/-src-node1/-src-node2` files.

    Two reference quirks reproduced exactly:

      * edge ITERATION order is networkx MultiDiGraph adjacency order,
        not insertion order: edges group by source node (in node
        insertion order), then by target (first-pair occurrence), then
        multi-edge key (insertion);
      * the node list appends the relation node for EVERY edge
        (duplicate rel names get fresh nodes, :69) while subject/object
        nodes are appended only on first occurrence and indexed by
        `list.index` — the FIRST occurrence of the NAME, which may be a
        relation node if names collide (:66-72).

    Everything is windows + joins — no Python, no collect; the grouped
    strings are per-example sized (≤ 7 triples in the reference).
    """
    fuse = lambda c: F.concat_ws("_", F.split(F.col(c), r"\s+"))  # noqa: E731
    # (subj, pred, obj) tiebreak keeps eidx deterministic when several
    # triples share one order_col value (same-sentence extractions)
    w_e = Window.partitionBy(example_col).orderBy(
        order_col, fuse("subj"), fuse("pred"), fuse("obj")
    )
    e = triples.select(
        F.col(example_col).cast("long").alias("ex"),
        (F.row_number().over(w_e) - 1).alias("eidx"),
        fuse("subj").alias("u"),
        fuse("pred").alias("rel"),
        fuse("obj").alias("v"),
    )
    # graph-node insertion position (add_edge inserts u then v)
    np_ = (
        e.select("ex", F.col("u").alias("name"), (2 * F.col("eidx")).alias("p"))
        .unionByName(
            e.select("ex", F.col("v").alias("name"), (2 * F.col("eidx") + 1).alias("p"))
        )
        .groupBy("ex", "name")
        .agg(F.min("p").alias("npos"))
    )
    # first occurrence of each (u, v) pair (adjacency slot order)
    pp = e.groupBy("ex", "u", "v").agg(F.min("eidx").alias("pairpos"))
    w_j = Window.partitionBy("ex").orderBy("npos", "pairpos", "eidx")
    em = (
        e.join(np_.withColumnRenamed("name", "u"), ["ex", "u"])
        .join(pp, ["ex", "u", "v"])
        .withColumn("j", F.row_number().over(w_j) - 1)
        .select("ex", "j", "u", "rel", "v")
    )
    occ = (
        em.select("ex", (3 * F.col("j")).alias("pos"), F.col("u").alias("name"),
                  F.lit(0).alias("is_rel"), "j")
        .unionByName(
            em.select("ex", (3 * F.col("j") + 1).alias("pos"), F.col("rel").alias("name"),
                      F.lit(1).alias("is_rel"), "j")
        )
        .unionByName(
            em.select("ex", (3 * F.col("j") + 2).alias("pos"), F.col("v").alias("name"),
                      F.lit(0).alias("is_rel"), "j")
        )
    )
    mp = occ.groupBy("ex", "name").agg(F.min("pos").alias("minpos"))
    kept = occ.join(mp, ["ex", "name"]).filter(
        (F.col("is_rel") == 1) | (F.col("pos") == F.col("minpos"))
    )
    w_id = Window.partitionBy("ex").orderBy("pos")
    ids = kept.withColumn("nid", F.row_number().over(w_id) - 1)
    entid = ids.filter(F.col("pos") == F.col("minpos")).select(
        "ex", "name", F.col("nid").alias("entid")
    )
    relid = ids.filter(F.col("is_rel") == 1).select("ex", "j", F.col("nid").alias("relid"))
    pairs = (
        em.join(entid.withColumnRenamed("name", "u").withColumnRenamed("entid", "n1"), ["ex", "u"])
        .join(relid, ["ex", "j"])
        .select("ex", "j", F.lit(0).alias("slot"), F.lit("A0").alias("label"),
                "n1", F.col("relid").alias("n2"))
        .unionByName(
            em.join(entid.withColumnRenamed("name", "v").withColumnRenamed("entid", "n1"), ["ex", "v"])
            .join(relid, ["ex", "j"])
            .select("ex", "j", F.lit(1).alias("slot"), F.lit("A1").alias("label"),
                    "n1", F.col("relid").alias("n2"))
        )
    )
    nodes_s = ids.groupBy("ex").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "name"))), lambda s: s["name"]
            ),
            " ",
        ).alias("nodes")
    )
    edge_agg = lambda col: F.array_join(  # noqa: E731
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "slot", F.col(col).cast("string").alias("x")))),
            lambda s: s["x"],
        ),
        " ",
    )
    edges_s = pairs.groupBy("ex").agg(
        edge_agg("label").alias("labels"),
        edge_agg("n1").alias("node1"),
        edge_agg("n2").alias("node2"),
    )
    return (
        nodes_s.join(edges_s, "ex")
        .select(F.col("ex").alias("example_id"), "nodes", "labels", "node1", "node2")
    )


def degree_table(edges: DataFrame, example_col: str = "doc_id") -> DataFrame:
    """Per-example node degrees over subject→object edges.

    Input: (example, src, dst). Output: (example, node, in_deg, out_deg).
    """
    outd = edges.groupBy(example_col, F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    ind = edges.groupBy(example_col, F.col("dst").alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        outd.join(ind, [example_col, "node"], "full_outer")
        .fillna(0, ["in_deg", "out_deg"])
        .select(example_col, "node", "in_deg", "out_deg")
    )


def sources_and_sinks(edges: DataFrame, example_col: str = "doc_id") -> DataFrame:
    """G6: per example, nodes with in-degree 0 (sources) / out-degree 0
    (sinks); `is_cyclic` flags examples where either set is empty
    (the reference drops those, build_dataset.py:269-272)."""
    deg = degree_table(edges, example_col)
    marked = deg.select(
        example_col,
        "node",
        (F.col("in_deg") == 0).alias("is_source"),
        (F.col("out_deg") == 0).alias("is_sink"),
    )
    flags = marked.groupBy(example_col).agg(
        F.max(F.col("is_source").cast("int")).alias("has_source"),
        F.max(F.col("is_sink").cast("int")).alias("has_sink"),
    )
    return marked.join(flags, example_col).withColumn(
        "is_cyclic", (F.col("has_source") == 0) | (F.col("has_sink") == 0)
    )


PATHS_SCHEMA = StructType(
    [
        StructField("example_id", LongType()),
        StructField("gtr_seq", StringType()),
        StructField("gtr_jumps", ArrayType(IntegerType())),
        StructField("dropped_cyclic", IntegerType()),
    ]
)


def bfs_path_py(edges: list[tuple[str, str, str]]) -> tuple[list[str], list[int]] | None:
    """Pure-Python G7 semantics for one example (≤~10 edges).

    Reimplements build_dataset.py:256-288: sources = in-degree-0 nodes,
    ends = out-degree-0 nodes; for each source, BFS shortest paths; keep
    paths ending at sinks; serialize ``node rel node rel …`` recording a
    cumulative token offset per path. Returns None for cyclic examples.
    Insertion order of nodes follows edge order (dict preserves it),
    matching networkx's node ordering for this construction.
    """
    adj: dict[str, dict[str, str]] = {}
    nodes: dict[str, None] = {}
    indeg: dict[str, int] = defaultdict(int)
    outdeg: dict[str, int] = defaultdict(int)
    for s, p, o in edges:
        nodes.setdefault(s, None)
        nodes.setdefault(o, None)
        # DiGraph semantics: one edge per (s, o); later labels overwrite
        adj.setdefault(s, {})[o] = p
    for s in adj:
        for o in adj[s]:
            outdeg[s] += 1
            indeg[o] += 1
    sources = [n for n in nodes if indeg[n] == 0]
    ends = [n for n in nodes if outdeg[n] == 0]
    if not sources or not ends:
        return None
    graph_seq: list[str] = []
    jumps: list[int] = []
    for source in sources:
        # BFS shortest paths from source (nx.shortest_path semantics)
        prev: dict[str, str] = {}
        order: list[str] = [source]
        seen = {source}
        qi = 0
        while qi < len(order):
            u = order[qi]
            qi += 1
            for v in adj.get(u, {}):
                if v not in seen:
                    seen.add(v)
                    prev[v] = u
                    order.append(v)
        for end in order:
            if end == source or end not in ends:
                continue
            path = [end]
            while path[-1] != source:
                path.append(prev[path[-1]])
            path.reverse()
            graph_seq.append(path[0])
            for i in range(len(path) - 1):
                graph_seq.append(adj[path[i]][path[i + 1]])
                graph_seq.append(path[i + 1])
            jumps.append(len(" ".join(graph_seq).split()))
    return graph_seq, jumps


def distributed_bfs(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 8,
) -> DataFrame:
    """G7's scale path: BFS levels via iterative frontier joins.

    The reference's per-example graphs are ≤7 edges, so
    :func:`serialize_paths` runs whole-graph BFS inside a grouped UDF.
    For graphs too large for one group (the KG itself — millions of
    nodes), this is the distributed analog: each round joins the
    frontier to the edge table and anti-joins already-visited nodes.

    edges: (src, dst); sources: (node). Returns (node, depth, root) —
    shortest hop count from the nearest source (first-source-wins by
    min root for determinism, W2).

    Scale notes: each round is one shuffle join on src; the visited set
    stays partitioned by node; rounds = graph diameter (bounded by
    max_depth). Head-node fan-out is AQE-skew-split.
    """
    frontier = sources.select(
        F.col("node"), F.lit(0).alias("depth"), F.col("node").alias("root")
    )
    visited = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                F.lit(depth).alias("depth"),
                F.col("root"),
            )
            .groupBy("node", "depth")
            .agg(F.min("root").alias("root"))
            .join(visited.select("node"), "node", "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).groupBy("node").agg(
            F.min("depth").alias("depth"), F.min("root").alias("root")
        )
        visited = visited.localCheckpoint(eager=True)
        frontier = nxt
    return visited


def serialize_paths(
    triples: DataFrame, example_col: str = "doc_id", order_col: str = "sent_idx"
) -> DataFrame:
    """G7 over a triples DataFrame: one (gtr_seq, gtr_jumps) row per
    example; cyclic examples emit dropped_cyclic=1 with null sequence.

    Edges within an example are processed in `order_col` order (the
    reference reads triples in file order, build_dataset.py:274-288);
    rows arriving at the grouped UDF carry no order guarantee, so the
    sort inside the group is what makes the serialization deterministic
    (and therefore oracle-checkable). Pass order_col=None to accept
    arrival order."""
    cols = [F.col(example_col).cast("long").alias(example_col), "subj", "pred", "obj"]
    if order_col:
        cols.insert(1, F.col(order_col))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if order_col:
            # (subj, pred, obj) tiebreak: rows arriving with EQUAL
            # order_col values would otherwise keep their shuffle order
            # (sort_values' default quicksort is unstable) and make the
            # serialization nondeterministic run-to-run
            pdf = pdf.sort_values([order_col, "subj", "pred", "obj"])
        edges = list(zip(pdf["subj"], pdf["pred"], pdf["obj"]))
        res = bfs_path_py(edges)
        if res is None:
            return pd.DataFrame(
                [[key[0], None, None, 1]],
                columns=["example_id", "gtr_seq", "gtr_jumps", "dropped_cyclic"],
            )
        seq, jumps = res
        return pd.DataFrame(
            [[key[0], " ".join(seq), jumps, 0]],
            columns=["example_id", "gtr_seq", "gtr_jumps", "dropped_cyclic"],
        )

    return triples.select(*cols).groupBy(example_col).applyInPandas(run, PATHS_SCHEMA)
