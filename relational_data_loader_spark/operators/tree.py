"""Conversation-tree operators: branching transcripts → linear paths.

Agent transcripts are not always linear: a regeneration, an edited user
turn, or a tree-of-thought rollout creates SIBLING turns that share a
parent, and the training corpus wants each root→leaf path as one linear
sample (plus a "canonical" path per conversation for eval). The table
shape is a forest: (conv, node, parent) with parent NULL at the root.

The naive recursive walk is depth-sequential: a chain of D turns takes D
dependent joins. ``tree_paths`` instead does POINTER DOUBLING (parallel
list ranking): every node keeps a pointer to the highest ancestor reached
so far plus the path segment it has already covered; one self-join per
round splices each node's segment with its ancestor's, doubling covered
length. Convergence takes ceil(log2(max_depth)) rounds — a 1000-turn
pathological chain is 10 joins, not 1000 — and every round is one
equi-join on (conv, ancestor) + a scalar pending-count, both
shuffle-partitioned, nothing driver-side but the loop counter.

Scale notes: per-round state is exactly one row per node with a path
segment no longer than the node's depth; rounds are lineage-truncated via
``localCheckpoint`` with explicit release of the superseded round (the
same discipline as dedup_clusters — holding k rounds of a 10^9-node state
in executor storage is the failure mode, not the join). A cycle in the
parent pointers (corrupt data) can never converge; the round cap raises
instead of spinning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relational_data_loader_spark.operators.dedup import _release_checkpoint


def tree_paths(
    turns: DataFrame,
    conv_col: str,
    node_col: str,
    parent_col: str,
    max_rounds: int = 48,
) -> DataFrame:
    """Root-to-leaf paths for every leaf of a (conv, node, parent) forest.

    Returns one row per LEAF (a node never referenced as a parent within
    its conv): ``conv_col``, ``node_col`` (the leaf), ``depth`` (number of
    nodes on the path, root included), ``path`` (array of node ids,
    ROOT-FIRST). Node ids may be any orderable type; parent NULL marks a
    root. A parent pointing at a node absent from ``turns`` (dangling —
    truncated log) is treated as a root cut: the path stops there rather
    than erroring, matching how a replayer would see the data.

    ``max_rounds`` bounds doubling rounds; 48 covers depth 2^48. Hitting
    the cap with pointers still unresolved means a parent-pointer CYCLE —
    that raises, because emitting partial paths for corrupt data would be
    silently wrong.
    """
    c, n = conv_col, node_col
    # eager=False (r6): the lazy checkpoint is materialized by the next
    # pending-count probe, fusing checkpoint + probe into ONE Spark job
    # per doubling round (was two). Block storage and lineage truncation
    # are unchanged — same discipline as dedup_clusters' loop.
    # hash-partition the state by conv ONCE (r6): the doubling join's keys
    # are (conv, node)/(conv, _anc), and HashPartitioning([conv]) on BOTH
    # sides of the self-join satisfies the join's distribution (subset
    # rule), so every round joins co-partitioned cache blocks with ZERO
    # exchanges — the partitioning survives each localCheckpoint (the
    # LogicalRDD keeps outputPartitioning). One exchange at build time
    # replaces two per round (guide §2.4).
    state = turns.select(
        c,
        n,
        F.col(parent_col).alias("_anc"),
        F.array(F.col(n)).alias("_seg"),
    ).repartition(F.col(c)).localCheckpoint(eager=False)

    rounds = 0
    prev = None
    while True:
        # full count, no limit: this probe is what MATERIALIZES the lazy
        # checkpoint, so it must compute every partition (a limit can
        # short-circuit partitions, which would leave checkpoint blocks
        # unstored for the self-join below)
        pending = state.filter(F.col("_anc").isNotNull()).count()
        if prev is not None:
            # only NOW is the superseded round safe to free: the lazy
            # checkpoint just materialized read its blocks
            _release_checkpoint(prev)
            prev = None
        if pending == 0:
            break
        if rounds >= max_rounds:
            raise ValueError(
                f"tree_paths: pointers unresolved after {max_rounds} "
                "doubling rounds — parent-pointer cycle (or depth > "
                f"2^{max_rounds}); refusing to emit partial paths"
            )
        rounds += 1
        s, l = state.alias("s"), state.alias("l")
        new = s.join(
            l,
            (F.col(f"s.{c}") == F.col(f"l.{c}"))
            & (F.col("s._anc") == F.col(f"l.{n}")),
            "left",
        ).select(
            F.col(f"s.{c}").alias(c),
            F.col(f"s.{n}").alias(n),
            # done rows (anc NULL) never match and stay done; a dangling
            # anc (no match) resolves to NULL = root cut
            F.col("l._anc").alias("_anc"),
            F.when(F.col(f"l.{n}").isNull(), F.col("s._seg"))
            .otherwise(F.concat(F.col("s._seg"), F.col("l._seg")))
            .alias("_seg"),
        ).localCheckpoint(eager=False)
        prev = state
        state = new

    parents = (
        turns.filter(F.col(parent_col).isNotNull())
        .select(c, F.col(parent_col).alias(n))
        .distinct()
    )
    leaves = state.join(parents, [c, n], "left_anti")
    # the FINAL round's checkpoint stays persisted — the returned plan
    # reads it and a truncated-lineage checkpoint cannot be recomputed;
    # the ContextCleaner frees it when the caller drops the DataFrame
    return leaves.select(
        c,
        n,
        F.size("_seg").alias("depth"),
        F.reverse("_seg").alias("path"),
    )


def canonical_paths(
    turns: DataFrame,
    conv_col: str,
    node_col: str,
    parent_col: str,
    max_rounds: int = 48,
) -> DataFrame:
    """One path per conversation: the DEEPEST leaf's root→leaf path, ties
    broken by the largest leaf id (latest regeneration wins — the
    convention a chat UI uses to show 'the' conversation). Same output
    shape as ``tree_paths``."""
    from pyspark.sql.window import Window

    p = tree_paths(turns, conv_col, node_col, parent_col, max_rounds)
    w = Window.partitionBy(conv_col).orderBy(
        F.col("depth").desc(), F.col(node_col).desc()
    )
    return (
        p.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
