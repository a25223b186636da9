"""PageRank over a hash-derived link graph (operators/graph.py):
conservation, known-answer vs a dense NumPy power iteration, dangling
handling, determinism, and the per-iteration plan shape."""

import numpy as np
import pyspark.sql.functions as F

from relational_data_loader_spark.operators.graph import (
    doc_authority,
    hash_link_graph,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["id"])


def _numpy_pagerank(pairs, n, iterations, d=0.85):
    """Dense reference: identical recurrence, matrix-vector form."""
    deg = np.zeros(n)
    for s, _ in pairs:
        deg[s] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = pr[deg == 0].sum()
        contrib = np.zeros(n)
        for s, t in pairs:
            contrib[t] += pr[s] / deg[s]
        pr = (1 - d) / n + d * (contrib + dangling / n)
    return pr


def test_pagerank_matches_dense_reference(spark):
    # ring + one hub: 0->1->2->3->0, everyone also ->0
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 0), (2, 0), (3, 0)]
    pairs = sorted(set(pairs))
    got = {
        r["id"]: r["pr"]
        for r in pagerank(
            _edges(spark, pairs), _nodes(spark, range(4)), 4, iterations=6
        ).collect()
    }
    want = _numpy_pagerank(pairs, 4, 6)
    for i in range(4):
        assert abs(got[i] - want[i]) < 1e-12
    # conservation: total rank is a probability distribution every round
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the hub (0) must dominate
    assert got[0] == max(got.values())


def test_pagerank_dangling_mass_redistributed(spark):
    # 0->1, 1 is a sink (dangling): without redistribution rank leaks and
    # the total drifts below 1
    pairs = [(0, 1)]
    res = pagerank(
        _edges(spark, pairs), _nodes(spark, range(3)), 3, iterations=8
    ).collect()
    total = sum(r["pr"] for r in res)
    assert abs(total - 1.0) < 1e-9
    want = _numpy_pagerank(pairs, 3, 8)
    for r in res:
        assert abs(r["pr"] - want[r["id"]]) < 1e-12


def test_hash_link_graph_deterministic_and_in_range(spark):
    docs = spark.range(50).select(F.col("id").alias("doc_id"))
    e1 = hash_link_graph(docs, 50).collect()
    e2 = hash_link_graph(docs, 50).collect()
    assert sorted(map(tuple, e1)) == sorted(map(tuple, e2))
    assert all(0 <= r["dst"] < 50 and r["src"] != r["dst"] for r in e1)
    # k=3 minus self/multi-edge collapses: every node links out at least once
    out = {r["src"] for r in e1}
    assert len(out) == 50


def test_doc_authority_rounded_and_conserved(spark):
    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    res = doc_authority(docs, 40, iterations=4).collect()
    assert len(res) == 40
    # authority is N-scaled rank: mean exactly 1 up to rounding
    assert abs(sum(r["authority"] for r in res) / 40 - 1.0) < 1e-4


def test_pagerank_plan_no_cartesian(spark):
    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    edges = hash_link_graph(docs, 30)
    pr = pagerank(edges, docs.select(F.col("doc_id").alias("id")), 30,
                  iterations=1)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
