"""Snapshot diff: derive a change feed from two table states.

The reverse of the engine's apply path. The reference consumes SQL Server's
change feed; real deployments also need the *other* direction — given two
snapshots of a table (yesterday's replica and today's, or the pre- and
post-state of a backfill), emit the I/U/D changelog that transforms one
into the other. This is how a lake table without CDC upstream still feeds
downstream incremental consumers, and how replica drift is audited
(diff(replica, source) must be empty).

Scale notes: ONE full outer join on the primary key — both sides shuffle
on the same uniformly-distributed key (or co-locate for free if both are
bucketed by PK, the layout the engine's own sink writes). The change
classification is a projection; unchanged rows are dropped by a filter
BEFORE any downstream work, so the output is proportional to the drift,
not the table. No window, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    primary_keys: list[str],
    compare_cols: list[str] | None = None,
    include_old: bool = False,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Changelog that transforms ``old`` into ``new``.

    Output: one row per drifted key — ``op`` I (in new only), D (in old
    only), U (in both, any compare column differs; NULL-safe) — carrying
    the key and the NEW payload (NULL payload on D, matching the CT
    envelope convention of deletes carrying keys only).
    ``include_old=True`` additionally emits ``<col>_old`` columns (NULL on
    I) — the before-image that algebraic rollup maintenance
    (``operators.incremental``) consumes.

    ``compare_cols`` defaults to every non-key column shared by both sides.
    Comparison is null-safe (``<=>``): NULL → value and value → NULL are
    updates, NULL → NULL is unchanged. ``carry_cols`` ride along from the
    NEW side (NULL on D) without participating in change detection — e.g.
    payload columns when the comparison runs on a row-version column alone
    (the sink's change-data-feed does exactly that).
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in primary_keys]
    carry_cols = carry_cols or []

    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in primary_keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in primary_keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        *[F.col(c).alias(f"_c_{c}") for c in carry_cols],
    )
    cond = None
    for k in primary_keys:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    in_old = F.col(f"_ok_{primary_keys[0]}").isNotNull()
    in_new = F.col(f"_nk_{primary_keys[0]}").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))

    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    key_cols = [
        F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
        for k in primary_keys
    ]
    payload = [F.col(f"_n_{c}").alias(c) for c in compare_cols]
    payload += [F.col(f"_c_{c}").alias(c) for c in carry_cols]
    if include_old:
        payload += [F.col(f"_o_{c}").alias(f"{c}_old") for c in compare_cols]
    return (
        j.select(op.alias("op"), *key_cols, *payload)
        .filter(F.col("op").isNotNull())
    )
