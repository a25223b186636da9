"""join_view_change_feed: base-table deltas → the enrichment view's own
I/U/D feed, composing into apply_delta_rollup (IVM cascade).

Two contracts, both checked against full recompute over the new base
states:
1. applying the derived feed to the previous view (generic anti-join +
   union) reproduces join_view(fact_new, dim_new) exactly;
2. driving apply_delta_rollup with the derived feed (group = a dim
   attribute, so the group drifts under fk moves, dim rewrites, and dim
   deletes → NULL group) reproduces the recomputed rollup exactly.

The fixture deliberately covers every interaction case: fact I whose fk's
dim row changed the same epoch, fact U that moves the fk, fact U that only
rewrites the measure, fact D, dim I/U/D, a fact pointing at a never-present
dim key (NULL group in both states), and a dim delete that flips surviving
facts into the NULL group.
"""

from pyspark.sql import functions as F

from relational_data_loader_spark.operators.incremental import (
    apply_delta_rollup,
    finalize_rollup,
    group_rollup,
    join_view,
    join_view_change_feed,
)

ATTRS = ["seg"]


def _frames(spark):
    # dim_old: keys 1..4 (key 5 never exists; key 6 arrives this epoch)
    dim_old = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C"), (4, "D")], ["k", "seg"]
    )
    # dim feed: I k=6, U k=2 (B→B2), D k=3
    dim_changes = spark.createDataFrame(
        [(6, "F", "I"), (2, "B2", "U"), (3, None, "D")],
        ["k", "seg", "op"],
    )
    # fact_old rows: (pk, fk, v)
    #   10→1  untouched
    #   11→2  untouched, but dim k=2 updates  → dim-driven U (seg B→B2)
    #   12→3  untouched, but dim k=3 deleted  → dim-driven U (seg C→NULL)
    #   13→1  fact U moves fk 1→4             → group A→D
    #   14→4  fact U rewrites measure only
    #   15→2  fact D (its dim also changed — D must win, no dim-driven row)
    #   16→5  fk never in dim: NULL group in prev AND new
    fact_old = spark.createDataFrame(
        [
            (10, 1, 10.0),
            (11, 2, 11.0),
            (12, 3, 12.0),
            (13, 1, 13.0),
            (14, 4, 14.0),
            (15, 2, 15.0),
            (16, 5, 16.0),
        ],
        ["pk", "fk", "v"],
    )
    # fact feed: I pk=17→6 (new dim key arriving same epoch),
    #            I pk=18→2 (dim key updated same epoch → must see B2),
    #            U pk=13 fk→4 v→13.5, U pk=14 v→14.5, D pk=15
    fact_changes = spark.createDataFrame(
        [
            (17, 6, 17.0, "I"),
            (18, 2, 18.0, "I"),
            (13, 4, 13.5, "U"),
            (14, 4, 14.5, "U"),
            (15, None, None, "D"),
        ],
        ["pk", "fk", "v", "op"],
    )
    fact_new = spark.createDataFrame(
        [
            (10, 1, 10.0),
            (11, 2, 11.0),
            (12, 3, 12.0),
            (13, 4, 13.5),
            (14, 4, 14.5),
            (16, 5, 16.0),
            (17, 6, 17.0),
            (18, 2, 18.0),
        ],
        ["pk", "fk", "v"],
    )
    dim_new = spark.createDataFrame(
        [(1, "A"), (4, "D"), (6, "F"), (2, "B2")], ["k", "seg"]
    )
    return dim_old, dim_changes, fact_old, fact_changes, fact_new, dim_new


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r) for r in df.select(*cols).collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_feed_is_netted_and_reproduces_view(spark):
    dim_old, dim_changes, fact_old, fact_changes, fact_new, dim_new = _frames(
        spark
    )
    prev = join_view(fact_old, dim_old, "fk", "k", ATTRS)
    feed = join_view_change_feed(
        prev, fact_changes, dim_changes, dim_old, ["pk"], "fk", "k", ATTRS
    )
    feed.cache()
    try:
        # netted: one envelope row per fact PK
        assert feed.count() == feed.select("pk").distinct().count()
        # D beats dim-driven: pk=15 appears exactly once, as D
        ops15 = [r.op for r in feed.filter(F.col("pk") == 15).collect()]
        assert ops15 == ["D"]
        # fk-move U carries both groups
        r13 = feed.filter(F.col("pk") == 13).collect()[0]
        assert (r13.seg_old, r13.seg) == ("A", "D")
        # dim delete flips survivors to NULL group
        r12 = feed.filter(F.col("pk") == 12).collect()[0]
        assert (r12.seg_old, r12.seg, r12.op) == ("C", None, "U")
        # same-epoch dim update visible to a fact insert
        r18 = feed.filter(F.col("pk") == 18).collect()[0]
        assert (r18.seg, r18.op) == ("B2", "I")

        # generic apply(feed) == full recompute of the view
        applied = prev.join(
            feed.select("pk").distinct(), "pk", "left_anti"
        ).unionByName(
            feed.filter(F.col("op").isin("I", "U")).select(*prev.columns)
        )
        recomputed = join_view(fact_new, dim_new, "fk", "k", ATTRS)
        assert _rows(applied) == _rows(recomputed)
    finally:
        feed.unpersist()


def test_cascade_rollup_equals_recompute(spark):
    dim_old, dim_changes, fact_old, fact_changes, fact_new, dim_new = _frames(
        spark
    )
    prev = join_view(fact_old, dim_old, "fk", "k", ATTRS)
    feed = join_view_change_feed(
        prev, fact_changes, dim_changes, dim_old, ["pk"], "fk", "k", ATTRS
    )
    prev_rollup = group_rollup(prev, F.col("seg"), "v")
    incr = finalize_rollup(
        apply_delta_rollup(
            prev_rollup,
            feed,
            F.col("seg"),
            "v",
            "v_old",
            old_group=F.col("seg_old"),
        )
    )
    full = finalize_rollup(
        group_rollup(join_view(fact_new, dim_new, "fk", "k", ATTRS),
                     F.col("seg"), "v")
    )
    assert _rows(incr) == _rows(full)
    # NULL group present exactly once on both sides (pk=12 and pk=16)
    nulls = [r for r in incr.collect() if r.grp is None]
    assert len(nulls) == 1 and nulls[0].n_rows == 2
