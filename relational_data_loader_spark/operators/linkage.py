"""Entity resolution: blocking + edit-distance verification linkage.

The standard two-stage record-linkage shape (Fellegi–Sunter style
candidate generation, deterministic verification):

1. **Blocking** — candidate pairs are generated ONLY within equal values
   of cheap deterministic keys (nation, segment, name prefix …), turning
   the O(|A|·|B|) comparison space into a bucket-equi-join that shuffles
   on the block key. Same discipline as the LSH dedup family
   (operators/dedup.py): never materialize the cross product.
2. **Verification** — the JVM's threshold-banded ``levenshtein(a, b, cap)``
   (O(len·cap), returns −1 above ``cap``) confirms each candidate pair,
   so the expensive metric runs on Σ block² candidates, never corpus².

A ``max_block`` guard keeps adversarial blocks (a blocking key shared by
millions of rows — the empty-name pathology) from going quadratic: blocks
above the cap are dropped WITH a count, mirroring the documented drop
semantics of ``embedding_near_dup_pairs``'s bucket cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_edit_linkage(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_dist: int,
    max_block: int = 10_000,
) -> DataFrame:
    """Link ``left`` rows to ``right`` rows whose ``name_col`` is within
    ``max_dist`` Levenshtein edits, comparing only within equal
    ``block_cols``. Output: (left id, right id, distance), one row per
    verified pair. Self-linkage (same id both sides) is excluded so the
    same table can be passed twice.

    Blocks larger than ``max_block`` on either side are excluded
    entirely (bounded-cost contract; at 100 TB an unguarded hot block is
    a full-shuffle-to-one-task stall). Callers needing those rows must
    refine the blocking key.
    """
    lt = left.select(
        F.col(id_col).alias("_lid"),
        F.lower(F.trim(F.col(name_col))).alias("_lname"),
        *[F.col(c) for c in block_cols],
    )
    rt = right.select(
        F.col(id_col).alias("_rid"),
        F.lower(F.trim(F.col(name_col))).alias("_rname"),
        *[F.col(c) for c in block_cols],
    )
    lt = _cap_blocks(lt, block_cols, max_block)
    rt = _cap_blocks(rt, block_cols, max_block)
    # threshold-banded levenshtein: -1 when distance > max_dist, so the
    # verify predicate is a half-open band check, O(len·max_dist) per pair
    dist = F.levenshtein(F.col("_lname"), F.col("_rname"), int(max_dist))
    return (
        lt.join(rt, block_cols)
        .filter(F.col("_lid") != F.col("_rid"))
        .withColumn("_dist", dist)
        .filter(F.col("_dist") >= 0)
        .select(
            F.col("_lid").alias("left_id"),
            F.col("_rid").alias("right_id"),
            F.col("_dist").alias("edit_dist"),
        )
    )


def _cap_blocks(df: DataFrame, block_cols: list[str], max_block: int) -> DataFrame:
    """Drop rows whose block exceeds ``max_block`` members (window count;
    single pass, no extra join)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*block_cols)
    return (
        df.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= max_block)
        .drop("_bn")
    )
