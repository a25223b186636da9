"""Bitemporal point queries and multi-source consistent cuts over a
change log.

Two time axes live in every CDC stream: *system time* (the lsn — when the
change was ingested) and *valid time* (the business timestamp carried on
the row). ``bitemporal_asof`` answers the full bitemporal question — "what
did we BELIEVE (as of system lsn L) the state valid at business time T
was?" — which subsumes plain time travel (L = ∞) and plain as-of
(T = ∞). ``consistent_cut`` answers the multi-source question — when N
source tables sync independently, the only transactionally consistent
snapshot is the one cut at the SLOWEST source's watermark.

Both are pure DataFrame plans: one window (partitioned on the key) for
the as-of, one tiny aggregate + broadcast for the cut. Reference locus:
RDL tracks one watermark per table (SURVEY.md §2.1 S3/C3) but offers no
cross-table consistency; this is the operator a relational destination
needs to expose coherent multi-table reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bitemporal_asof(
    log: DataFrame,
    key_cols: list[str],
    system_cut: Column,
    valid_cut: Column,
    lsn_col: str = "lsn",
    valid_col: str = "ts",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Per key, the row version valid at ``valid_cut`` as known at system
    time ``system_cut``; keys whose winning version is a delete are absent.

    Winner = among rows with lsn <= system_cut AND valid ts <= valid_cut,
    the one with the greatest (valid ts, lsn) — lsn breaks valid-time ties
    because a later-ingested correction of the same business timestamp
    supersedes the earlier belief. One shuffle (the per-key window); both
    cut predicates are plain comparisons that push to the scan when the
    cuts are literals.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(valid_col).desc(), F.col(lsn_col).desc()
    )
    return (
        log.filter((F.col(lsn_col) <= system_cut) & (F.col(valid_col) <= valid_cut))
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != F.lit(delete_op)))
        .drop("_rn")
    )


def consistent_cut(
    log: DataFrame,
    source_col: str,
    lsn_col: str = "lsn",
) -> DataFrame:
    """The global consistent-cut lsn for a log multiplexing N sources:
    ``min`` over sources of each source's high-watermark (``max`` lsn).

    Any snapshot built from events at or below this lsn contains, for
    every source, a prefix of that source's stream — no source appears
    "from the future" relative to another. One partial-agged groupBy on
    the (tiny) source dimension, then a 1-row global min; the result is a
    1-row frame meant to be broadcast into the filter that builds the
    snapshot (see ``cut_snapshot``).
    """
    per_source = log.groupBy(source_col).agg(F.max(lsn_col).alias("hwm"))
    return per_source.agg(F.min("hwm").alias("cut_lsn"))


def cut_snapshot(
    log: DataFrame,
    cut: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """LWW snapshot of ``log`` truncated at the 1-row ``cut`` frame's
    ``cut_lsn``: per key the highest-lsn surviving row at or below the
    cut, deletes dropped.

    The cut joins in as a broadcast (1 row), so the only shuffle is the
    per-key window — identical cost to an uncut LWW snapshot.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(lsn_col).desc())
    return (
        log.join(F.broadcast(cut), F.col(lsn_col) <= F.col("cut_lsn"), "inner")
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != F.lit(delete_op)))
        .drop("_rn", "cut_lsn")
    )
