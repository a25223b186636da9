"""Watermarked stream-stream interval joins.

The last Structured-Streaming surface the engine exposes: joining two live
event tails on a key within a time window — click→purchase attribution,
request→response pairing, change-event→audit-event correlation. Batch
as-of/interval joins exist in operators/ (asof.py, range_join.py); this is
their streaming twin, where neither side is ever complete.

How Spark bounds the state (the reason the watermark + time-range condition
are REQUIRED, not optional): each side buffers its rows in the state store
until the OTHER side's watermark passes the end of the interval in which a
match could still arrive — the join condition's time bounds tell Spark how
long that is, the watermarks tell it event time has moved on. With both,
state is O(rows within watermark+interval), independent of stream age;
without either, Spark must buffer a side forever and (for inner joins)
refuses nothing but leaks, so this module refuses to build the join unless
both are supplied.

Emission: inner joins emit a pair as soon as both rows have arrived.
Outer-side NULL rows emit only when the watermark CLOSES the possibility
of a match — an outer stream-stream join's unmatched rows arrive one
watermark-delay late by construction. That is Spark semantics, not a
choice here; the equivalence test pins it for the inner case where
batch == stream exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window: str,
    left_delay: str,
    right_delay: str,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where ``right_ts`` falls in
    ``[left_ts, left_ts + window]``.

    ``window``/``left_delay``/``right_delay`` are SQL interval strings
    ("30 minutes"). Column names other than ``key`` must be disjoint
    between the two sides (alias before calling) — ``left_ts`` and
    ``right_ts`` in particular, since both survive into the output.

    Works identically on batch DataFrames (withWatermark is a no-op there),
    which is what the batch/stream equivalence test exploits.
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct column names — both "
            "sides' timestamps survive into the joined row"
        )
    l = left.withWatermark(left_ts, left_delay)  # noqa: E741
    r = right.withWatermark(right_ts, right_delay)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + INTERVAL {window}"))
    )
    return l.join(r, cond, how).drop(r[key])
