"""Distributed BFS (frontier joins) vs plain-Python BFS levels."""

import random
from collections import deque

from rdf_to_text_spark.operators.graph import distributed_bfs


def _py_bfs_levels(edges, sources):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    depth = {s: 0 for s in sources}
    root = {s: s for s in sources}
    q = deque(sorted(sources))
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in depth:
                depth[v] = depth[u] + 1
                root[v] = root[u]
                q.append(v)
            elif depth[v] == depth[u] + 1:
                root[v] = min(root[v], root[u])  # min-root tie-break (W2)
    return depth, root


def test_bfs_levels_match_python(spark):
    random.seed(5)
    edges = [(random.randrange(60), random.randrange(60)) for _ in range(120)]
    edges = [e for e in edges if e[0] != e[1]]
    sources = [0, 1, 2]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    got = {r.node: (r.depth, r.root) for r in distributed_bfs(e, s, max_depth=12).collect()}
    depth, root = _py_bfs_levels(edges, sources)
    assert {n: d for n, (d, _r) in got.items()} == depth
    # min-root determinism at every node
    assert {n: r for n, (_d, r) in got.items()} == root


def test_bfs_respects_max_depth(spark):
    chain = [(i, i + 1) for i in range(10)]
    e = spark.createDataFrame(chain, "src long, dst long")
    s = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.depth for r in distributed_bfs(e, s, max_depth=3).collect()}
    assert max(got.values()) == 3 and len(got) == 4


def test_bfs_disconnected_nodes_absent(spark):
    e = spark.createDataFrame([(1, 2), (10, 11)], "src long, dst long")
    s = spark.createDataFrame([(1,)], "node long")
    got = {r.node for r in distributed_bfs(e, s).collect()}
    assert got == {1, 2}
