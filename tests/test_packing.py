"""Sequence packing (operators/packing.py): concat-then-chunk assignment
semantics, shard determinism, and the single-exchange plan contract."""

import pytest
from pyspark.sql import functions as F

from relational_data_loader_spark.operators.packing import (
    pack_sequences,
    packed_sequence_stats,
)


def _docs(spark, rows):
    """rows: (doc_id, n_tokens) — text is n single-letter tokens."""
    return spark.createDataFrame(
        [(i, " ".join(["x"] * n)) for i, n in rows], "doc_id long, text string"
    )


def test_straddler_stays_in_start_sequence(spark):
    """A doc crossing the budget boundary belongs to the sequence its
    FIRST token falls in (the trainer's chunker splits it there)."""
    asg = pack_sequences(
        _docs(spark, [(0, 3), (1, 3), (2, 3)]), budget=5, n_shards=1
    )
    got = {r["doc_id"]: (r["seq_idx"], r["offset"]) for r in asg.collect()}
    # offsets 0, 3, 6 — doc 1 straddles token 5 but starts at 3 → seq 0
    assert got == {0: (0, 0), 1: (0, 3), 2: (1, 6)}


def test_offsets_are_contiguous_and_stats_roll_up(spark):
    rows = [(i, (i % 4) + 1) for i in range(40)]
    asg = pack_sequences(_docs(spark, rows), budget=7, n_shards=4)
    per_shard = {}
    for r in sorted(asg.collect(), key=lambda r: (r["shard"], r["doc_id"])):
        assert r["shard"] == r["doc_id"] % 4
        assert r["offset"] == per_shard.get(r["shard"], 0)  # no gaps
        assert r["seq_idx"] == r["offset"] // 7
        per_shard[r["shard"]] = r["offset"] + r["toks"]

    stats = packed_sequence_stats(asg, budget=7).collect()
    assert sum(s["n_docs"] for s in stats) == 40
    assert sum(s["seq_tokens"] for s in stats) == sum(n for _, n in rows)
    for s in stats:
        assert s["first_doc"] <= s["last_doc"]
        assert s["fill_ratio"] == round(s["seq_tokens"] / 7.0, 4)


def test_single_exchange_plan(spark):
    """The per-shard window's hash exchange also serves the (shard, seq)
    rollup — HashPartitioning(shard) satisfies the groupBy clustering, so
    the whole operator is ONE shuffle."""
    docs = _docs(spark, [(i, 2) for i in range(16)])
    stats = packed_sequence_stats(pack_sequences(docs, 8, 4), budget=8)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_rejects_nonpositive_knobs(spark):
    docs = _docs(spark, [(0, 1)])
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0, n_shards=1)
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=8, n_shards=0)


def test_custom_tokens_column_override(spark):
    """A precomputed token count (e.g. a real tokenizer's, landed by the
    ingest pipeline) replaces the whitespace default."""
    docs = _docs(spark, [(0, 1), (1, 1)]).withColumn("real_toks", F.lit(6))
    asg = pack_sequences(
        docs, budget=10, n_shards=1, tokens_col=F.col("real_toks")
    )
    got = {r["doc_id"]: r["seq_idx"] for r in asg.collect()}
    assert got == {0: 0, 1: 0}  # offsets 0 and 6 under the override
