"""merge_asof (operators/asof.py): semantics the SQL twin can't pin —
brute-force equality across all three directions, equality matching,
tolerance voiding, unmatched-left survival, nearest tie-break to
backward, and the no-range-join plan gate.
"""

import pytest
from pyspark.sql import functions as F

from relational_data_loader_spark.operators.asof import merge_asof

# left (by, on); right (by, on, val)
LEFT = [("a", 10), ("a", 20), ("a", 30), ("b", 5), ("c", 7)]
RIGHT = [("a", 8, "r8"), ("a", 20, "r20"), ("a", 26, "r26"), ("b", 50, "r50")]


def _frames(spark):
    l = spark.createDataFrame(LEFT, "k string, t long")
    r = spark.createDataFrame(RIGHT, "k string, t long, val string")
    return l, r


def _brute(direction, tolerance=None):
    out = {}
    for k, t in LEFT:
        cands = [(rt, v) for rk, rt, v in RIGHT if rk == k]
        if direction == "backward":
            cands = [(rt, v) for rt, v in cands if rt <= t]
            best = max(cands, key=lambda x: x[0]) if cands else None
        elif direction == "forward":
            cands = [(rt, v) for rt, v in cands if rt >= t]
            best = min(cands, key=lambda x: x[0]) if cands else None
        else:  # nearest, tie -> backward
            best = None
            for rt, v in cands:
                if best is None:
                    best = (rt, v)
                    continue
                d_new, d_old = abs(rt - t), abs(best[0] - t)
                if d_new < d_old or (d_new == d_old and rt < t <= best[0]):
                    best = (rt, v)
        if best is not None and tolerance is not None and abs(best[0] - t) > tolerance:
            best = None
        out[(k, t)] = best
    return out


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_matches_bruteforce(spark, direction):
    l, r = _frames(spark)
    got = {
        (row["k"], row["t"]): (
            None
            if row["val_r"] is None
            else (int(row["_asof_on_r"]), row["val_r"])
        )
        for row in merge_asof(
            l, r, by="k", on="t", value_cols=["val"], direction=direction
        ).collect()
    }
    assert got == _brute(direction)
    assert len(got) == len(LEFT)  # every left row survives


def test_equality_matches_and_tolerance_voids(spark):
    l, r = _frames(spark)
    rows = {
        (row["k"], row["t"]): row["val_r"]
        for row in merge_asof(
            l, r, by="k", on="t", value_cols=["val"],
            direction="backward", tolerance=2,
        ).collect()
    }
    assert rows[("a", 20)] == "r20"  # equal key matches at distance 0
    assert rows[("a", 10)] == "r8"  # distance 2 == tolerance: kept
    assert rows[("a", 30)] is None  # r26 at distance 4: voided
    assert rows[("b", 5)] is None  # only future right rows
    assert rows[("c", 7)] is None  # key with no right rows at all


def test_nearest_tie_breaks_backward(spark):
    l = spark.createDataFrame([("a", 10)], "k string, t long")
    r = spark.createDataFrame(
        [("a", 8, "before"), ("a", 12, "after")], "k string, t long, val string"
    )
    row = merge_asof(
        l, r, by="k", on="t", value_cols=["val"], direction="nearest"
    ).collect()[0]
    assert row["val_r"] == "before" and int(row["_asof_on_r"]) == 8


def test_plan_single_union_window_no_range_join(spark):
    l, r = _frames(spark)
    plan = (
        merge_asof(l, r, by="k", on="t", value_cols=["val"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 2  # one hash partition + AQE read


def test_foreachbatch_stream_enrichment_equals_batch(spark, tmp_path):
    """The production shape for stream enrichment: merge_asof against a
    static dimension inside foreachBatch. Per-batch as-of is correct
    because the right side is static and each left row's match is
    independent of other left rows — so the union of per-batch results
    must equal the one-shot batch join regardless of how the stream is
    chunked."""
    left = [("a", t) for t in (5, 10, 15, 25, 40)] + [("b", 9), ("b", 30)]
    l_df = spark.createDataFrame(left, "k string, t long")
    r_df = spark.createDataFrame(
        [("a", 8, "r8"), ("a", 24, "r24"), ("b", 29, "r29")],
        "k string, t long, val string",
    )
    src = str(tmp_path / "src")
    # two files -> at least two micro-batches with maxFilesPerTrigger=1
    l_df.filter(F.col("t") < 15).coalesce(1).write.parquet(src + "/p1")
    l_df.filter(F.col("t") >= 15).coalesce(1).write.parquet(src + "/p2")

    batches = []
    stream = (
        spark.readStream.schema("k string, t long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/p*")
    )

    def enrich(df, epoch_id):
        out = merge_asof(
            df, r_df, by="k", on="t", value_cols=["val"],
            direction="backward", tolerance=10,
        )
        batches.append(out.toPandas())

    q = (
        stream.writeStream.foreachBatch(enrich)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import pandas as pd

    got = (
        pd.concat(batches)
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    want = (
        merge_asof(
            l_df, r_df, by="k", on="t", value_cols=["val"],
            direction="backward", tolerance=10,
        )
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(batches) >= 2  # genuinely chunked, not one batch
