"""Surface-form canonicalization: first-token clustering + join-based CC.

Two layers, mirroring SURVEY.md G5/J7:

1. :func:`first_token_clusters` — the reference's exact 1-hop
   semantics (`build_dataset.py:226-246`): group entity surfaces by
   first token, sort the variant list (`v.sort()` at `:243`), rewrite
   every variant to the representative ``v[0]``.

2. :func:`connected_components` — the generalized transitive closure
   the north_rule demands: alternating large-star / small-star
   DataFrame joins (Kiveris et al., "Connected Components in
   MapReduce"), converging in O(log n) rounds. GraphFrames is absent
   in this environment, and an explicit join formulation lets us salt
   the skewed head-entity keys; AQE skew-join handles the residual.

Scale notes: each round is two shuffles on (node) — the *only*
shuffle-heavy stage in the whole pipeline. The first-token pass runs
first because it shrinks components by ~|aliases/entity|, which is
what keeps star-join fan-in bounded at Common-Crawl scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_token_clusters(surfaces: DataFrame, surface_col: str = "surface") -> DataFrame:
    """(surface, rep) — representative = lexicographic min among
    surfaces sharing a first token (reference `ent_dict` semantics:
    sorted list, first element)."""
    keyed = surfaces.select(surface_col).distinct().withColumn(
        "first_token", F.split(F.col(surface_col), r"\s+").getItem(0)
    )
    reps = keyed.groupBy("first_token").agg(F.min(surface_col).alias("rep"))
    return keyed.join(reps, "first_token").select(
        F.col(surface_col).alias("surface"), "rep"
    )


def connected_components(
    edges: DataFrame, max_iter: int = 16, check_every: int = 2
) -> DataFrame:
    """(node, component) — component = min node id reachable.

    edges: (src long, dst long), undirected interpretation. Implements
    alternating large-star/small-star:

      large-star: for each node u, connect every strictly-larger
                  neighbor to min(neighbors ∪ {u});
      small-star: connect every ≤-neighbor to the minimum.

    Each iteration is a groupBy on node — the natural salting point for
    head-entity skew: the groupBy key is already the node id, so AQE
    skew-split handles hot nodes; `repartition` before the loop bounds
    the reduce fan-in.
    """
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )
    # seed: parent = min neighbor (or self)
    for i in range(max_iter):
        # ---- large-star: u -> all neighbors (both directions), attach
        # strictly larger neighbors to the min of the neighborhood.
        nbrs = e.select("src", "dst").unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = nbrs.groupBy("src").agg(F.min("dst").alias("m"))
        mins = mins.withColumn("m", F.least("m", "src"))
        large = (
            nbrs.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        # ---- small-star: attach ≤ neighbors (and self) to the min.
        small_nbrs = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        smins = small_nbrs.groupBy("src").agg(F.min("dst").alias("m"))
        small = (
            small_nbrs.join(smins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(smins.select(F.col("src"), F.col("m").alias("dst")))
        )
        new_e = (
            large.unionByName(small)
            .filter(F.col("src") != F.col("dst"))
            .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
            .distinct()
        )
        # Checkpoint + convergence-probe only every `check_every` rounds:
        # an eager localCheckpoint per round (full edge-set write+read)
        # measured 6x slower end-to-end on chain-heavy graphs (BENCH.md).
        if (i + 1) % check_every == 0:
            new_e = new_e.localCheckpoint(eager=True)  # cut lineage growth
            e = new_e
            # converged when every remaining edge points at a root:
            # src of every edge is a component minimum (no chain left).
            chained = new_e.alias("a").join(
                new_e.alias("b"), F.col("a.src") == F.col("b.dst"), "left_semi"
            )
            if chained.isEmpty():
                break
        else:
            e = new_e
    comp = e.select(F.col("dst").alias("node"), F.col("src").alias("component"))
    roots = e.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return comp.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def canonical_entities(triples: DataFrame) -> DataFrame:
    """Canonical entity table from extracted triples: cluster subject and
    object surfaces (first-token pass) and pick the sorted representative.

    Output: (surface, canonical_surface) for every distinct surface seen.
    """
    surfaces = triples.select(F.col("subj_surface").alias("surface")).unionByName(
        triples.select(F.col("obj_surface").alias("surface"))
    )
    return first_token_clusters(surfaces)


def canonical_entity_table(surfaces: DataFrame) -> DataFrame:
    """The full canonicalization tail (north_rule): first-token
    clustering (G5) shrinks the graph, then join-based CC resolves
    transitive surface↔representative chains; singleton clusters (whose
    only CC edge would be a self-loop) survive via left-join+coalesce.

    surfaces: one column ``surface``. Output:
    (component, canonical, surfaces: array<string>).
    """
    clusters = first_token_clusters(surfaces)
    nodes = (
        clusters.select("surface")
        .unionByName(clusters.select(F.col("rep").alias("surface")))
        .distinct()
        .withColumn("node", F.abs(F.xxhash64("surface")))
    )
    cc_edges = clusters.select(
        F.abs(F.xxhash64("surface")).alias("src"),
        F.abs(F.xxhash64("rep")).alias("dst"),
    )
    comp = connected_components(cc_edges, max_iter=8)
    return (
        nodes.join(comp, "node", "left")
        .withColumn("component", F.coalesce("component", "node"))
        .groupBy("component")
        .agg(
            F.min("surface").alias("canonical"),
            F.sort_array(F.collect_set("surface")).alias("surfaces"),
        )
    )
