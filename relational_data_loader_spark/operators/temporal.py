"""Temporal enrichment over change logs: SCD2 fact-to-dimension as-of
joins and calendar-spine gap fill.

The warehouse consumption layer of the CDC engine: once a change log is
netted (operators/lww.py) or historized (scd2_history), the next thing a
user does is JOIN FACTS TO IT "as of" each fact's own position in the
log, and fill reporting calendars where the log is silent. The reference
(SURVEY.md §2 C-family) stops at replication; these are the two
operations every one of its downstream warehouses performs on the
replicated table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_temporal_join(
    facts: DataFrame,
    dim_log: DataFrame,
    keys: list[str],
    fact_lsn_col: str,
    dim_lsn_col: str,
    dim_attr_cols: list[str],
    dim_op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Enrich each fact row with the dimension version valid AT the
    fact's log position — the SCD2 temporal join, with delete-closed
    intervals done right: a fact landing after the key's delete (and
    before any rebirth) gets NULL attributes, not the stale last version
    a naive as-of join would resurrect.

    Plan, sized for 10^11 facts x 10^9 dimension changes: NOT a range
    join (facts x versions interval containment explodes on hot keys and
    compiles to a bucketed or nested-loop join) and NOT a per-fact
    point lookup. Both streams are UNIONED and sorted once per key on
    (lsn, side) — dimension changes sort before facts at equal lsn so a
    version taking effect at L covers a fact at L — and a single
    ``last(ignorenulls)`` running window carries the latest dimension
    struct forward onto every fact row. One shuffle total, identical in
    shape to net_changes; the dimension's full SCD2 interval table is
    never materialized.

    ``facts`` and ``dim_log`` must not share non-key column names.
    Output: every fact row + ``dim_attr_cols`` (NULL when the key was
    deleted or not yet born at the fact's lsn) + ``dim_lsn`` (the
    version's own lsn, NULL likewise) + boolean ``dim_live``.
    """
    fact_cols = [c for c in facts.columns if c not in keys and c != fact_lsn_col]
    dim_struct = F.struct(
        F.col(dim_lsn_col).alias("_lsn"),
        F.col(dim_op_col).alias("_op"),
        *[F.col(c) for c in dim_attr_cols],
    )
    d = dim_log.select(
        *keys,
        F.col(dim_lsn_col).alias("_pos"),
        F.lit(0).alias("_side"),
        dim_struct.alias("_dim"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c) for c in fact_cols],
    )
    f = facts.select(
        *keys,
        F.col(fact_lsn_col).alias("_pos"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(d.schema["_dim"].dataType).alias("_dim"),
        *fact_cols,
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_pos", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_dim", ignorenulls=True).over(w)
    # live must read the MATERIALIZED _cur column: reusing the window
    # expression after the _side filter would recompute it over fact rows
    # only (all-NULL _dim) and silently report every fact as dead
    cur = F.col("_cur")
    live = cur.isNotNull() & (cur["_op"] != delete_op)
    return (
        d.unionByName(f)
        .withColumn("_cur", carried)
        .filter(F.col("_side") == 1)
        .select(
            *keys,
            F.col("_pos").alias(fact_lsn_col),
            *fact_cols,
            F.when(live, cur["_lsn"]).alias("dim_lsn"),
            *[F.when(live, cur[c]).alias(c) for c in dim_attr_cols],
            F.coalesce(live, F.lit(False)).alias("dim_live"),
        )
    )


def calendar_gapfill(
    df: DataFrame,
    ts_col: str,
    agg_exprs: list[Column],
    carry_cols: list[str],
    grain: str = "day",
) -> DataFrame:
    """Densify a time series onto a complete calendar spine: one row per
    ``grain`` between the data's min and max timestamp, aggregates
    zero-absent, plus a forward-filled copy of each ``carry_cols``
    aggregate (last observed value persists across silent periods —
    the reporting convention for stock-like measures).

    Scale shape: the heavy input collapses to one row per grain FIRST
    (plain groupBy, partial-agged map-side); the spine is generated from
    a 1-row min/max aggregate via ``sequence`` (control plane — never a
    scan), the join is spine-sized, and the forward-fill window runs
    over the spine's single partition. That single partition is safe BY
    CONSTRUCTION: its row count is the calendar length (10^4 rows for
    30 years of days), invariant in the input's row count — the one
    place a global window is the right plan.

    ``agg_exprs`` must alias their outputs; ``carry_cols`` names a
    subset of those aliases to forward-fill (emitted as ``<name>_ffill``).
    """
    bucket = F.date_trunc(grain, F.col(ts_col))
    per = df.groupBy(bucket.alias("bucket")).agg(*agg_exprs)
    span = df.agg(
        F.date_trunc(grain, F.min(ts_col)).alias("_lo"),
        F.date_trunc(grain, F.max(ts_col)).alias("_hi"),
    )
    spine = span.select(
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"interval 1 {grain}"))
        ).alias("bucket")
    )
    filled = spine.join(per, "bucket", "left")
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    for c in carry_cols:
        filled = filled.withColumn(
            f"{c}_ffill", F.last(c, ignorenulls=True).over(w)
        )
    return filled
