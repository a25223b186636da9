"""tree_paths / canonical_paths: pointer-doubling path extraction over
branching conversation forests, vs hand-computed expectations."""

import pytest

from relational_data_loader_spark.operators.tree import (
    canonical_paths,
    tree_paths,
)


def _forest(spark):
    # conv "a": chain 1-2-3-4-5-6 with a branch at 3 → 7 → 8 and a
    #           sibling regeneration 9 under 1 (three leaves: 6, 8, 9)
    # conv "b": single root (leaf = root, depth 1)
    # conv "c": dangling parent (2 → 99 missing): root cut at 2
    rows = [
        ("a", 1, None), ("a", 2, 1), ("a", 3, 2), ("a", 4, 3),
        ("a", 5, 4), ("a", 6, 5), ("a", 7, 3), ("a", 8, 7), ("a", 9, 1),
        ("b", 1, None),
        ("c", 1, None), ("c", 2, 99),
    ]
    return spark.createDataFrame(rows, ["conv", "node", "parent"])


def test_tree_paths_exact(spark):
    got = {
        (r.conv, r.node): (r.depth, list(r.path))
        for r in tree_paths(_forest(spark), "conv", "node", "parent").collect()
    }
    assert got == {
        ("a", 6): (6, [1, 2, 3, 4, 5, 6]),
        ("a", 8): (5, [1, 2, 3, 7, 8]),
        ("a", 9): (2, [1, 9]),
        ("b", 1): (1, [1]),
        ("c", 1): (1, [1]),
        ("c", 2): (1, [2]),  # dangling parent = root cut
    }


def test_canonical_picks_deepest_then_latest(spark):
    got = {
        r.conv: (r.node, r.depth)
        for r in canonical_paths(
            _forest(spark), "conv", "node", "parent"
        ).collect()
    }
    assert got["a"] == (6, 6)
    assert got["b"] == (1, 1)
    assert got["c"] == (2, 1)  # tie on depth 1 → larger leaf id wins


def test_deep_chain_needs_few_rounds(spark):
    # depth 33 chain: doubling must resolve it (6 rounds), the sequential
    # walk would need 33
    rows = [("x", i, i - 1 if i > 1 else None) for i in range(1, 34)]
    df = spark.createDataFrame(rows, ["conv", "node", "parent"])
    out = tree_paths(df, "conv", "node", "parent").collect()
    assert len(out) == 1
    assert out[0].depth == 33
    assert list(out[0].path) == list(range(1, 34))


def test_cycle_raises(spark):
    rows = [("x", 1, 2), ("x", 2, 1)]
    df = spark.createDataFrame(rows, ["conv", "node", "parent"])
    with pytest.raises(ValueError, match="cycle"):
        tree_paths(df, "conv", "node", "parent", max_rounds=6).collect()
