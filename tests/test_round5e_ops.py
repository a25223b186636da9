"""Round-5 session-5 additions: reciprocal-rank fusion for hybrid
search and embedding-based benchmark decontamination (plus their scale
plan gates: RRF joins stay k-sized, decontam's only join is a broadcast
of the benchmark side)."""

import pyspark.sql.functions as F

from relational_data_loader_spark.operators.contamination import (
    embedding_decontamination,
)
from relational_data_loader_spark.operators.index import rrf_fuse


# --------------------------------------------------------------------------
# rrf_fuse


def _ranked(spark, rows, score_col):
    return spark.createDataFrame(rows, ["doc_id", score_col])


def test_rrf_known_values(spark):
    # retriever A ranks 1,2,3; retriever B ranks 3,2,9
    a = _ranked(spark, [(1, 9.0), (2, 5.0), (3, 1.0)], "score")
    b = _ranked(spark, [(3, 0.9), (2, 0.8), (9, 0.1)], "sim")
    got = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse([(a, "score"), (b, "sim")], k0=60).collect()
    }
    assert got[1] == round(1 / 61, 6)  # only in A, rank 1
    assert got[2] == round(1 / 62 + 1 / 62, 6)  # rank 2 in both
    assert got[3] == round(1 / 63 + 1 / 61, 6)
    assert got[9] == round(1 / 63, 6)  # only in B, rank 3
    # doc 2 (consistently good) must outrank doc 9 (one weak appearance)
    assert got[2] > got[9]


def test_rrf_tie_breaks_deterministic(spark):
    # equal scores: rank order must fall back to id, so reruns agree
    a = _ranked(spark, [(7, 1.0), (4, 1.0), (5, 1.0)], "s")
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([(a, "s")]).collect()}
    assert got[4] > got[5] > got[7]


# --------------------------------------------------------------------------
# embedding_decontamination


def test_decontam_flags_and_max(spark):
    mk = lambda vid, v: (vid, [float(x) for x in v])  # noqa: E731
    bench = spark.createDataFrame(
        [mk(0, [1, 0, 0]), mk(97, [0, 1, 0])], ["vec_id", "embedding"]
    )
    corpus = spark.createDataFrame(
        [
            mk(1, [1, 0.1, 0]),  # ~parallel to bench 0 -> contaminated
            mk(2, [0, 0, 1]),  # orthogonal to both -> clean
            mk(3, [-1, 0, 0]),  # anti-parallel -> max_sim 0 vs bench 97
        ],
        ["vec_id", "embedding"],
    )
    got = {
        r["vec_id"]: (r["max_sim"], r["contaminated"])
        for r in embedding_decontamination(
            corpus, bench, threshold=0.9
        ).collect()
    }
    assert got[1][1] is True and got[1][0] > 0.99
    assert got[2] == (0.0, False)
    assert got[3] == (0.0, False)  # max over both bench vectors, not min


def test_decontam_plan_is_broadcast_only(spark):
    import random

    rows = [
        (i, [random.Random(i).random() for _ in range(4)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    plan = embedding_decontamination(
        df.filter("vec_id % 10 != 0"), df.filter("vec_id % 10 = 0")
    )._jdf.queryExecution().executedPlan().toString()
    # the corpus x benchmark pass must be the broadcast nested loop, and
    # the ONLY exchange is the final per-id aggregation shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange") <= 2  # broadcast exchange + agg shuffle
    assert "SortMergeJoin" not in plan


def test_rrf_handles_single_list_and_empty_overlap(spark):
    a = _ranked(spark, [(1, 2.0)], "s")
    b = _ranked(spark, [(8, 1.0)], "s")
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([(a, "s"), (b, "s")]).collect()}
    assert set(got) == {1, 8}
    assert got[1] == got[8] == round(1 / 61, 6)
