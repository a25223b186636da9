"""Incremental aggregate maintenance (algebraic IVM) over a change feed.

A CDC engine's downstream consumers keep *rollups* of the replicated table
(per-group counts/sums). Recomputing a rollup from a 10^10-row table after
every epoch is the anti-pattern this operator removes: sums and counts are
abelian-group aggregates, so a change feed carrying each key's OLD and NEW
value updates the rollup algebraically — ``+new − old`` per U, ``+new`` per
I, ``−old`` per D — touching only drifted groups.

Scale notes: the delta aggregation is one partial-aggregated groupBy over
the CHANGE FEED (proportional to drift, not table size); the merge into the
previous rollup is one join on the group key against a table whose
cardinality is the number of groups. Nothing scans the base table. Internal
arithmetic is DECIMAL so the incremental result is bit-identical to a full
recompute — floating-point addition is not associative, decimal addition
is, and "incremental equals recompute" is the operator's whole contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact associative carrier for double-valued measures
_DEC = "decimal(28,6)"


def group_rollup(state: DataFrame, group: Column, value_col: str) -> DataFrame:
    """Full-recompute rollup: per-group exact sum + row count. The bootstrap
    (and the correctness oracle) for ``apply_delta_rollup``."""
    return state.groupBy(group.alias("grp")).agg(
        F.sum(F.col(value_col).cast(_DEC)).alias("_sum"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def apply_delta_rollup(
    prev: DataFrame,
    changes: DataFrame,
    group: Column,
    value_col: str,
    old_value_col: str,
    op_col: str = "op",
    old_group: Column | None = None,
) -> DataFrame:
    """Merge a change feed into a previous rollup.

    ``changes`` rows are I/U/D envelopes carrying the new value
    (``value_col``, NULL on D) and the old value (``old_value_col``, NULL on
    I) — the shape ``operators.diff.snapshot_diff(include_old=True)`` emits.
    Groups whose net row count reaches zero are dropped (the group no longer
    exists, matching a recompute).

    ``group`` is evaluated against the NEW row values. With the default
    ``old_group=None`` the group expression MUST be immutable under
    updates (PK-derived — the engine's own CDF satisfies this: keys never
    change inside a U) — otherwise a U whose grouping column changed posts
    BOTH +new and −old to the new group, leaving the old group stale
    (ADVICE r4). When the group CAN drift, pass ``old_group`` (the same
    expression over the ``*_old`` columns): U rows then split into
    −old@old_group / +new@new_group, at the cost of a second aggregation
    over the feed (still drift-proportional, never table-scan).
    """
    op = F.col(op_col)
    if old_group is not None:
        adds = changes.where(op.isin("I", "U")).groupBy(
            group.alias("grp")
        ).agg(
            F.sum(F.col(value_col).cast(_DEC)).alias("_asum"),
            F.count(F.lit(1)).alias("_an"),
        )
        subs = changes.where(op.isin("D", "U")).groupBy(
            old_group.alias("grp")
        ).agg(
            F.sum(F.col(old_value_col).cast(_DEC)).alias("_ssum"),
            F.count(F.lit(1)).alias("_sn"),
        )
        zz = F.lit(0).cast(_DEC)
        delta = adds.join(subs, "grp", "full_outer").select(
            "grp",
            (F.coalesce(F.col("_asum"), zz) - F.coalesce(F.col("_ssum"), zz)).alias(
                "_dsum"
            ),
            (
                F.coalesce(F.col("_an"), F.lit(0))
                - F.coalesce(F.col("_sn"), F.lit(0))
            ).cast("bigint").alias("_dn"),
        )
    else:
        add = F.when(op.isin("I", "U"), F.col(value_col).cast(_DEC)).otherwise(
            F.lit(0).cast(_DEC)
        )
        sub = F.when(op.isin("D", "U"), F.col(old_value_col).cast(_DEC)).otherwise(
            F.lit(0).cast(_DEC)
        )
        dn = (
            F.when(op == "I", F.lit(1)).when(op == "D", F.lit(-1)).otherwise(F.lit(0))
        ).cast("bigint")
        delta = changes.groupBy(group.alias("grp")).agg(
            F.sum(add - sub).alias("_dsum"),
            F.sum(dn).alias("_dn"),
        )
    z = F.lit(0).cast(_DEC)
    merged = prev.join(delta, "grp", "full_outer").select(
        "grp",
        (F.coalesce(F.col("_sum"), z) + F.coalesce(F.col("_dsum"), z)).alias("_sum"),
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("_dn"), F.lit(0))
        ).alias("n_rows"),
    )
    return merged.filter(F.col("n_rows") > 0)


def finalize_rollup(rollup: DataFrame, dp: int = 2) -> DataFrame:
    """Publish form: exact decimal sum → rounded double (the catalog's
    cross-engine comparison convention)."""
    return rollup.select(
        "grp",
        F.round(F.col("_sum"), dp).cast("double").alias("sum_value"),
        "n_rows",
    )
