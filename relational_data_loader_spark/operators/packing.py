"""Sequence packing: assign documents to fixed-token-budget training
sequences (the "concat-then-chunk" packing GPT-style pretraining uses).

A training pipeline does not feed documents to the trainer one at a time —
it concatenates the token stream and chunks it into fixed-size sequences
(e.g. 2048/4096/8192 tokens). The packing ASSIGNMENT — which documents
land in which sequence — is what this operator computes; the actual token
concatenation happens downstream in the data loader. Semantics: within a
shard, documents are laid end-to-end in ``id_col`` order; a document
belongs to the sequence where its FIRST token falls, i.e.

    seq_idx = (running_offset_before_doc) div budget

A document straddling a budget boundary stays in the sequence it starts
in (the trainer's chunker splits it there) — that is the standard
concat-then-chunk rule, and it is what keeps the assignment expressible
as pure window arithmetic with no iterative bin-packing.

Scale shape (the reason for the shard column): a single global running
sum would be one sort on one reducer — a serial bottleneck at 10^10
documents. Sharding by ``id mod n_shards`` makes the parallelism exactly
``n_shards`` (set it to a small multiple of cluster cores); each shard
sorts locally after ONE hash exchange, and the per-(shard, seq) rollup
rides that same partitioning (HashPartitioning(shard) satisfies the
groupBy(shard, seq_idx) clustering), so the whole operator is a single
shuffle + per-shard sort. Plan-gated in tests/test_plans.py. The fill
target is per-shard, which is what packed-dataset writers want anyway:
one output file stream per shard, each internally offset-ordered.

Deterministic end to end: modulo shard (not ``hash()`` — portable to the
DuckDB oracle), total order within shard by the unique ``id_col``,
integer ``div`` (no float in the assignment arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from relational_data_loader_spark.functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: Column | None = None,
) -> DataFrame:
    """Per-document packing assignment: (shard, seq_idx, offset, tokens).

    ``tokens_col`` defaults to the engine's whitespace ``token_count`` on
    ``text_col``; pass a precomputed column (e.g. a real tokenizer's
    count landed by the ingest pipeline) to override.
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    toks = (tokens_col if tokens_col is not None else token_count(F.col(text_col)))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            F.pmod(F.col(id_col), F.lit(n_shards)).cast("bigint").alias("shard"),
            toks.alias("toks"),
        )
        .withColumn("cum", F.sum("toks").over(w))
        .select(
            "shard",
            F.expr(f"(cum - toks) div {budget}").alias("seq_idx"),
            F.col(id_col),
            (F.col("cum") - F.col("toks")).alias("offset"),
            "toks",
        )
    )


def packed_sequence_stats(
    assignment: DataFrame, budget: int, id_col: str = "doc_id"
) -> DataFrame:
    """Roll the per-doc assignment up to per-sequence fill stats.

    No new exchange: the assignment is already clustered by shard and a
    (shard, seq_idx) group is wholly inside one shard partition.
    ``fill_ratio`` > 1.0 is expected on the last doc straddling the
    boundary; chronically low fill means budget >> typical doc run.
    """
    return assignment.groupBy("shard", "seq_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("seq_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
        F.round(F.sum("toks") / F.lit(float(budget)), 4).alias("fill_ratio"),
    )
