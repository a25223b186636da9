"""Bucketed point-in-interval (range) join.

Spark has no native band/range join operator: ``points JOIN intervals ON
p BETWEEN s AND e`` with no equi-key compiles to BroadcastNestedLoopJoin —
every point tested against every interval, O(|P|·|I|), the classic
scale-killer of sessionization-against-calendar, IP-to-geo, and
event-to-deployment-window joins.

The standard fix (Databricks' range-join hints do the same internally):
quantize the domain into fixed-width buckets, explode each interval into
the buckets it covers, tag each point with its bucket, EQUI-join on the
bucket id, then re-check the exact predicate. Cost becomes
O(|P| + Σ_i len(i)/w) shuffled on a uniform integer key. Choosing ``w``
near the median interval length keeps the interval-side blowup ≈2×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (half-open), via bucket equi-join.

    ``point_col``/``start_col``/``end_col`` must be integer-comparable
    (cast timestamps to ``unix_micros`` first). Interval-side explode emits
    one row per covered bucket — ``sequence()`` is evaluated per row, so an
    interval spanning B buckets costs B rows, never a cross join.

    The exact range predicate lives IN the join condition, not in a
    post-join filter (ADVICE r4: a filter after an outer join silently
    drops the null-extended rows, degenerating every outer join to inner).
    ``how`` may be ``inner`` or ``left`` — a point has exactly ONE bucket
    row, so left semantics survive the bucketing (one null-extended row
    per unmatched point). Interval-side outer (``right``/``full``) is
    rejected: the explode gives an interval B bucket rows, and an outer
    join would emit B null-extended duplicates for an unmatched interval —
    flip the inputs and use ``left`` instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r}: only 'inner' and 'left' survive bucket "
            "explosion (flip inputs for interval-side outer semantics)"
        )
    w = F.lit(int(bucket_width))
    b_start = F.floor(F.col(start_col) / w)
    # half-open: a point equal to end is NOT matched, so the last covered
    # bucket is the one containing end-1
    b_end = F.floor((F.col(end_col) - F.lit(1)) / w)
    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(b_start, F.greatest(b_end, b_start)))
    ).alias("_iv")
    pt = points.withColumn("_bucket", F.floor(F.col(point_col) / w)).alias("_pt")
    cond = (
        (F.col("_pt._bucket") == F.col("_iv._bucket"))
        & (F.col(f"_pt.{point_col}") >= F.col(f"_iv.{start_col}"))
        & (F.col(f"_pt.{point_col}") < F.col(f"_iv.{end_col}"))
    )
    return pt.join(iv, cond, how).drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
) -> DataFrame:
    """Join every left interval to every right interval it OVERLAPS
    (half-open: ``l_start < r_end AND r_start < l_end``) — the general
    interval×interval sibling of ``point_in_interval_join`` (session-vs-
    session concurrency, downtime-vs-deploy attribution, speech-turn
    overlap in diarized audio).

    Same bucket-quantization rewrite, with the one extra trick the
    two-sided explode needs: a pair overlapping across B shared buckets
    would match B times, and deduplicating with DISTINCT would shuffle the
    whole pair stream again. Instead each candidate pair is emitted ONLY
    from the bucket containing the overlap's start, ``max(l_start,
    r_start)`` — a per-pair canonical bucket, so the join output is
    exactly-once by construction, no dedup stage. Cost is
    O(Σ len/w) rows per side, equi-shuffled on the bucket id; never a
    nested-loop cross.
    """
    w = F.lit(int(bucket_width))

    def boxed(df, s, e, tag):
        lo = F.floor(F.col(s) / w)
        hi = F.floor((F.col(e) - F.lit(1)) / w)
        return df.withColumn(
            "_bucket", F.explode(F.sequence(lo, F.greatest(hi, lo)))
        ).alias(tag)

    lv = boxed(left, l_start, l_end, "_l")
    rv = boxed(right, r_start, r_end, "_r")
    ls, le = F.col(f"_l.{l_start}"), F.col(f"_l.{l_end}")
    rs, re_ = F.col(f"_r.{r_start}"), F.col(f"_r.{r_end}")
    cond = (
        (F.col("_l._bucket") == F.col("_r._bucket"))
        & (ls < re_)
        & (rs < le)
        # canonical bucket: the one holding the overlap's first instant
        & (F.col("_l._bucket") == F.floor(F.greatest(ls, rs) / w))
    )
    return lv.join(rv, cond, "inner").drop("_bucket")
