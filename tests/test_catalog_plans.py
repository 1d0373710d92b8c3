"""Catalog-wide plan invariants: every registered driver query, swept.

Individual plan audits live in test_plan_audit.py; this sweep makes the
invariants STRUCTURAL — a new catalog entry inherits them automatically,
so a row-at-a-time Python UDF (or a broadcast regression on the known
broadcast-shaped queries) can't land unnoticed behind a passing
correctness check.
"""

import pytest

from rdf_to_text_spark import queries_catalog
from rdf_to_text_spark.plans.audit import formatted_plan, python_eval_nodes

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built_plans(spark):
    """Build every catalog DataFrame once (some builders run bounded
    setup actions: KMeans fit, count for a modulus, CC contraction)."""
    return {name: fn(spark, SF) for name, fn in queries_catalog.all_queries().items()}


def test_catalog_has_no_rowwise_python(built_plans):
    """BatchEvalPython = a row-at-a-time Python UDF — banned everywhere;
    only Arrow-vectorized Python nodes are allowed in any plan."""
    offenders = {
        name: nodes
        for name, df in built_plans.items()
        if "BatchEvalPython" in (nodes := python_eval_nodes(df))
    }
    assert not offenders, offenders


def test_catalog_python_stages_are_arrow_batched(built_plans):
    """Queries that do reach Python must do so through Arrow-batched
    operators (the fused extraction stage), never anything else."""
    allowed = {"ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "MapInArrow"}
    for name, df in built_plans.items():
        nodes = set(python_eval_nodes(df))
        assert nodes <= allowed, (name, nodes)


def test_known_broadcast_joins_still_broadcast(built_plans):
    """Dimension-sized join sides must stay broadcast (plan regression
    guard for the explicitly-hinted queries)."""
    for name in (
        "top_orders_per_segment",
        "kg_oov_tokens",
        "tpch_q3",
        "tpch_q5",
        "tpch_q18_big_orders",
        "tpch_q7_volume_shipping",
    ):
        assert "BroadcastHashJoin" in formatted_plan(built_plans[name]), name


def test_bucketed_shard_packer_has_no_single_partition_exchange(built_plans):
    """pack_training_shards_bucketed is the production form: the global
    cumsum must run per range bucket + driver offsets — an unpartitioned
    window would show up as Exchange SinglePartition (its spec twin
    pack_training_shards deliberately keeps one, as the arithmetic
    reference)."""
    plan = formatted_plan(built_plans["pack_training_shards_bucketed"])
    assert "SinglePartition" not in plan, plan
    spec = formatted_plan(built_plans["pack_training_shards"])
    assert "SinglePartition" in spec  # the twin really is the spec form
