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
        # eqNullSafe, not bare column equality: a LEFT enrichment view has
        # NULL groups (facts whose dim row is missing/deleted), and a plain
        # equi-join would keep the NULL-group add and sub rows apart,
        # duplicating the NULL group in the output.
        delta = adds.join(
            subs, adds["grp"].eqNullSafe(subs["grp"]), "full_outer"
        ).select(
            F.coalesce(adds["grp"], subs["grp"]).alias("grp"),
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
    merged = prev.join(
        delta, prev["grp"].eqNullSafe(delta["grp"]), "full_outer"
    ).select(
        F.coalesce(prev["grp"], delta["grp"]).alias("grp"),
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


def join_view(
    fact: DataFrame,
    dim: DataFrame,
    fk: str,
    dim_key: str,
    dim_attrs: list[str],
) -> DataFrame:
    """Full-recompute bootstrap of an enrichment view: ``fact LEFT JOIN
    dim`` on ``fact.fk = dim.dim_key``, dim attributes appended under their
    own names. LEFT (not inner) is deliberate: it makes the view's row set
    a pure function of the fact table, which is what lets
    ``apply_delta_join_view`` treat dim-side churn as a column rewrite
    instead of a row add/remove — inner-join IVM needs an orphan-fact side
    table to resurrect facts when their dim key later appears."""
    return fact.join(
        dim.select(F.col(dim_key).alias(fk), *dim_attrs), fk, "left"
    )


def apply_delta_join_view(
    prev: DataFrame,
    fact_changes: DataFrame,
    dim_changes: DataFrame,
    dim_old: DataFrame,
    fact_pk: list[str],
    fk: str,
    dim_key: str,
    dim_attrs: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Incrementally maintain ``join_view(fact, dim, ...)`` under one epoch
    of I/U/D change feeds on BOTH sides — the materialized-enrichment twin
    of ``apply_delta_rollup``. The contract is the same: applying the
    deltas to the previous view must equal a full recompute against the
    new base states (the catalog oracle IS that recompute).

    Feed shapes:
    - ``fact_changes``: op + the fact's full NEW row (op='D' rows need only
      the PK; other columns are ignored for D).
    - ``dim_changes``: op + ``dim_key`` + NEW ``dim_attrs`` (ignored for D).
    - ``dim_old``: the dim state BEFORE this epoch, used only to enrich the
      fact-side inserts/updates (pass the dim's own previous snapshot — a
      CDC deployment already materializes it).

    Two passes, equal to recompute by case analysis:
    1. Fact pass: anti-join the changed PKs out of the view, union back the
       I/U rows enriched against ``dim_old``. Unchanged facts keep their
       (possibly stale) dim attrs; new/updated facts get dim_old attrs —
       both fixed up by pass 2 exactly when their fk's dim row changed this
       epoch.
    2. Dim pass: left-join the pass-1 view against ``dim_changes`` on the
       fk. Matched 'D' nulls the attrs (the fact row survives — LEFT view),
       matched I/U overwrites with the new attrs, unmatched keeps pass-1
       values. An fk the fact row just moved TO (U that rewrote the fk)
       resolves correctly because pass 1 re-enriched the whole row.

    Scale: pass 1 costs |Δfact| ⋈ dim_old (broadcast when the dim is small;
    a shuffled equi-join otherwise) plus an anti-join on the fact PK — with
    the view stored bucketed by PK (sinks/snapshot.py layout) the anti-join
    and union are partition-local, no view-wide shuffle. Pass 2 is one
    equi-join whose build side is |Δdim| — drift-proportional, normally a
    broadcast. Neither pass rescans the fact base table; nothing here is
    proportional to view size except the streamed (non-build) side of the
    joins, which a columnar scan pipelines.

    Contract — NETTED feeds: at most one row per fact PK in
    ``fact_changes`` and one per ``dim_key`` in ``dim_changes`` (the
    engine's change feeds are netted by construction — operators/lww.py
    ``net_changes`` — and snapshot_diff emits one row per key by shape).
    A raw multi-event feed would duplicate view rows through the pass-2
    join; net it first. Fact columns and ``dim_attrs`` must also be
    disjoint name sets (the dim attributes are patched BY NAME), which is
    checked eagerly below."""
    op = F.col(op_col)
    overlap = set(dim_attrs) & (set(fact_changes.columns) - {op_col})
    if overlap:
        raise ValueError(
            f"dim_attrs {sorted(overlap)} collide with fact columns — the "
            "dim pass patches attributes by name, so a fact column of the "
            "same name would be silently overwritten; rename one side"
        )
    fact_cols = [c for c in prev.columns if c not in dim_attrs]
    upserts = join_view(
        fact_changes.filter(op.isin("I", "U")).select(*fact_cols),
        dim_old,
        fk,
        dim_key,
        dim_attrs,
    )
    changed_keys = fact_changes.select(*fact_pk).distinct()
    step1 = prev.join(changed_keys, fact_pk, "left_anti").unionByName(upserts)

    dim_delta = dim_changes.select(
        F.col(dim_key).alias(fk),
        op.alias("_dim_op"),
        *[F.col(a).alias(f"_new_{a}") for a in dim_attrs],
    )
    patched = [
        F.when(F.col("_dim_op").isNull(), F.col(a))
        .when(F.col("_dim_op") == "D", F.lit(None))
        .otherwise(F.col(f"_new_{a}"))
        .alias(a)
        for a in dim_attrs
    ]
    return step1.join(dim_delta, fk, "left").select(*fact_cols, *patched)


def join_view_change_feed(
    prev: DataFrame,
    fact_changes: DataFrame,
    dim_changes: DataFrame,
    dim_old: DataFrame,
    fact_pk: list[str],
    fk: str,
    dim_key: str,
    dim_attrs: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Derive the enrichment VIEW's own I/U/D change feed from the base
    tables' feeds — the composition primitive that lets IVM cascade
    (DBSP-style): base deltas → view delta → rollup delta, no stage ever
    rescanning its input's base.

    ``apply_delta_join_view`` patches the view in place but tells
    downstream consumers nothing; a rollup over the view would have to be
    recomputed. This operator instead emits one netted envelope row per
    affected view row (the view's PK is the fact PK, LEFT-join view):

    - fact I → view I (new row enriched against the POST-epoch dim state),
    - fact U → view U (new as above; old = the previous view row, so a U
      that moved the fk carries both the old and the new group),
    - fact D → view D (old = the previous view row, new columns NULL),
    - dim I/U/D on key k → view U for every untouched prev fact row with
      fk=k (old = prev row; new = same fact columns, attrs patched — NULL
      when the dim row was deleted, the LEFT view keeps the fact).

    Envelope shape: ``fact_pk`` + every view column (NEW values, NULL on D)
    + ``<col>_old`` for every non-PK view column (OLD values, NULL on I) +
    ``op`` — exactly what ``apply_delta_rollup(..., old_value_col=...,
    old_group=...)`` consumes, including group drift from fk moves and dim
    attribute rewrites.

    Contract: feeds are NETTED (one row per fact PK / dim key — the
    engine's CDF shape, operators/lww.py net_changes) and consistent with
    ``prev`` (a U's PK exists in prev, an I's does not). Scale: the
    fact-driven pass joins |Δfact| against the post-epoch dim (equi-join,
    broadcast when the dim is small) and against prev on the fact PK
    (partition-local under the sink's PK bucketing); the dim-driven pass is
    one equi-join of prev against |Δdim| on the fk plus an anti-join on
    touched PKs. Everything is drift-proportional on the build side;
    nothing rescans the fact base."""
    op = F.col(op_col)
    fact_cols = [c for c in prev.columns if c not in dim_attrs]
    non_pk = [c for c in prev.columns if c not in fact_pk]

    # Post-epoch dim state (dim_old with this epoch's deltas applied): the
    # correct enrichment source for fact-side I/U rows — enriching against
    # dim_old would hand a brand-new fact stale attributes whenever its
    # dim row changed in the same epoch.
    changed_dim = dim_changes.select(dim_key).distinct()
    dim_new = dim_old.join(changed_dim, dim_key, "left_anti").unionByName(
        dim_changes.filter(op.isin("I", "U")).select(dim_key, *dim_attrs)
    )

    prev_old = prev.select(
        *fact_pk, *[F.col(c).alias(f"{c}_old") for c in non_pk]
    )

    # Fact-driven rows: one per Δfact PK. D rows get NULL new columns from
    # the left join; I rows get NULL old columns.
    new_side = join_view(
        fact_changes.filter(op.isin("I", "U")).select(*fact_cols),
        dim_new,
        fk,
        dim_key,
        dim_attrs,
    )
    fact_driven = (
        fact_changes.select(*fact_pk, op.alias("_op"))
        .join(new_side, fact_pk, "left")
        .join(prev_old, fact_pk, "left")
    )

    # Dim-driven rows: untouched prev facts pointing at a changed dim key
    # become view UPDATEs (attrs patched, fact columns carried over).
    touched = fact_changes.select(*fact_pk).distinct()
    dim_delta = dim_changes.select(
        F.col(dim_key).alias(fk),
        op.alias("_dim_op"),
        *[F.col(a).alias(f"_new_{a}") for a in dim_attrs],
    )
    patched = [
        F.when(F.col("_dim_op") == "D", F.lit(None))
        .otherwise(F.col(f"_new_{a}"))
        .alias(a)
        for a in dim_attrs
    ]
    dim_driven = (
        prev.join(touched, fact_pk, "left_anti")
        .join(dim_delta, fk, "inner")
        .select(
            *fact_pk,
            *[F.col(c) for c in fact_cols if c not in fact_pk],
            *patched,
            *[F.col(c).alias(f"{c}_old") for c in non_pk],
            F.lit("U").alias("_op"),
        )
    )
    cols = [*fact_pk, *non_pk, *[f"{c}_old" for c in non_pk], "_op"]
    return (
        fact_driven.select(*cols)
        .unionByName(dim_driven.select(*cols))
        .withColumnRenamed("_op", op_col)
    )


def decayed_rollup(
    events: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    half_life_s: float,
    anchor: Column,
) -> DataFrame:
    """Per-key exponentially time-decayed score, anchored at ``anchor``
    (a timestamp Column or literal): score = Σ v_i · 0.5^((A − t_i)/hl).

    The decayed sum is incrementally maintainable because it is a plain
    sum in the anchored domain: every term's exponent is ≤ 0 relative to
    the anchor (old events underflow toward zero instead of new ones
    overflowing), and advancing the anchor is a single multiplicative
    rescale of the stored score — see ``advance_decayed``. This is the
    mergeable form streaming engagement/freshness scores need at CDC
    scale: the state table never rescans history, each epoch folds its
    delta with one groupBy + one outer merge.

    Returns (key, score) with score a raw double — callers round at the
    reporting edge, not in state (repeated round-trip rounding drifts).
    """
    a = F.unix_micros(anchor.cast("timestamp"))
    decay = F.pow(
        F.lit(0.5),
        (a - F.unix_micros(F.col(ts_col).cast("timestamp"))).cast("double")
        / F.lit(half_life_s * 1e6),
    )
    return events.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(F.col(value_col) * decay).alias("score")
    )


def advance_decayed(
    state: DataFrame,
    delta_scores: DataFrame,
    old_anchor: Column,
    new_anchor: Column,
    half_life_s: float,
) -> DataFrame:
    """Fold one epoch's decayed delta (computed by ``decayed_rollup`` at
    ``new_anchor``) into the stored state (anchored at ``old_anchor``):
    rescale the old scores by 0.5^(Δanchor/hl), then full-outer sum.
    Exactly equals recomputing ``decayed_rollup`` over base ∪ delta at
    ``new_anchor`` — pinned by the oracle-paired ``decayed_score_ivm``
    entry and tests — because rescaling distributes over the sum.
    """
    shift = F.pow(
        F.lit(0.5),
        (
            F.unix_micros(new_anchor.cast("timestamp"))
            - F.unix_micros(old_anchor.cast("timestamp"))
        ).cast("double")
        / F.lit(half_life_s * 1e6),
    )
    old = state.select(
        "key", (F.col("score") * shift).alias("score")
    ).alias("s")
    return old.join(delta_scores.alias("d"), "key", "full_outer").select(
        "key",
        (
            F.coalesce(F.col("s.score"), F.lit(0.0))
            + F.coalesce(F.col("d.score"), F.lit(0.0))
        ).alias("score"),
    )
