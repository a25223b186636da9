"""Generic as-of (merge_asof) join: for each left row, the nearest right
row per key at-or-before (backward), at-or-after (forward), or closest in
either direction (nearest), with an optional tolerance.

Spark has no native as-of join; the naive encoding — a range-predicate
join + groupBy(max) — compiles to BroadcastNestedLoopJoin or an exploded
theta join and dies at scale. This is the UNION-WINDOW form instead: tag
both sides, union them, and carry the most recent right payload forward
with one ``last(..., ignorenulls=True)`` running window per key. Cost is
ONE shuffle of |L|+|R| rows on the by-key and a per-key sort — the same
shape as any windowed aggregation, no pair explosion, no driver work.
Skew follows the by-key (a hot user's events land in one task), bounded
by that key's row count exactly like every other per-key window in the
engine.

The reference (SURVEY.md §2.2 joins) has no as-of concept; this is the
training-data-pipeline member of the join family (align telemetry to
transcript turns, snap quotes to trades, attach the latest config to each
event). Semantics follow pandas ``merge_asof``: matches allow equality,
``tolerance`` voids matches farther than the bound, unmatched left rows
survive with NULL right payload (left join), and ``nearest`` breaks exact
ties toward the BACKWARD candidate (pinned, deterministic).

Contract: ``on`` must be numeric (cast timestamps to epoch units first —
the forward pass sorts on the negated key, which timestamps can't do) and
UNIQUE per (by, side) — with duplicate keys the winner would be
sort-order dependent; callers pre-dedup (keep max lsn per key) exactly as
pandas requires sorted keys for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _one_pass(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    value_cols: list[str],
    suffix: str,
    negate: bool,
) -> DataFrame:
    """One directional pass: left columns + ``{c}{suffix}`` carried
    payload + ``_m_on{suffix}`` matched key (unmasked — caller applies
    tolerance). ``negate=False`` → backward (largest right ``on`` ≤ left
    ``on``); ``negate=True`` runs the identical window over the negated
    sort key, which is exactly the forward match. The right side sorts
    before the left at equal keys (``_side`` 0 < 1), so equality matches
    in both directions."""
    lcols = left.columns
    payload = [c for c in lcols if c not in (by, on)]
    l_tag = left.select(
        *lcols,
        F.lit(None).cast("double").alias("_r_on"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.lit(1).alias("_side"),
    )
    r_tag = right.select(
        F.col(by),
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in payload],
        F.col(on).cast("double").alias("_r_on"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.lit(0).alias("_side"),
    )
    key = (-F.col(on)) if negate else F.col(on)
    w = (
        Window.partitionBy(by)
        .orderBy(key.asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l_tag.unionByName(r_tag)
        .select(
            *lcols,
            "_side",
            F.last("_r_on", ignorenulls=True).over(w).alias(f"_m_on{suffix}"),
            *[
                F.last(f"{c}{suffix}", ignorenulls=True)
                .over(w)
                .alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def _ok(matched_on: Column, lcol: Column, tolerance) -> Column:
    ok = matched_on.isNotNull()
    if tolerance is not None:
        ok = ok & (
            F.abs(lcol.cast("double") - matched_on) <= F.lit(float(tolerance))
        )
    return ok


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance: float | int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """pandas-``merge_asof`` parity over DataFrames (see module docstring).

    Returns every ``left`` row plus ``{c}{suffix}`` for each of
    ``value_cols`` (NULL when unmatched / out of ``tolerance``) and
    ``_asof_on{suffix}`` — the matched right ``on`` key (NULL likewise),
    kept so callers can audit match distance.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction={direction!r}")
    lcols = left.columns
    if direction in ("backward", "forward"):
        out = _one_pass(
            left, right, by, on, value_cols, suffix,
            negate=(direction == "forward"),
        )
        ok = _ok(F.col(f"_m_on{suffix}"), F.col(on), tolerance)
        return out.select(
            *lcols,
            *[F.when(ok, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}") for c in value_cols],
            F.when(ok, F.col(f"_m_on{suffix}")).alias(f"_asof_on{suffix}"),
        )
    # nearest: one pass each way over the SAME union shuffle shape, then
    # pick the closer candidate per left row (exact tie → backward, pinned)
    back = _one_pass(left, right, by, on, value_cols, "_b", negate=False)
    fwd = _one_pass(left, right, by, on, value_cols, "_f", negate=True)
    joined = back.join(
        fwd.select(by, on, "_m_on_f", *[f"{c}_f" for c in value_cols]),
        [by, on],
    )
    d_b = F.abs(F.col(on).cast("double") - F.col("_m_on_b"))
    d_f = F.abs(F.col(on).cast("double") - F.col("_m_on_f"))
    use_back = F.col("_m_on_b").isNotNull() & (
        F.col("_m_on_f").isNull() | (d_b <= d_f)
    )
    chosen_on = F.when(use_back, F.col("_m_on_b")).otherwise(F.col("_m_on_f"))
    ok = _ok(chosen_on, F.col(on), tolerance)
    return joined.select(
        *lcols,
        *[
            F.when(
                ok,
                F.when(use_back, F.col(f"{c}_b")).otherwise(F.col(f"{c}_f")),
            ).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.when(ok, chosen_on).alias(f"_asof_on{suffix}"),
    )
