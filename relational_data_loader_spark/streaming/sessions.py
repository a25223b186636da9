"""Gap-based session windows via Spark's native ``session_window``.

``q_sessionize`` (queries.py) counts sessions per user with a lag/window
trick — fine for a batch report, but it cannot run on a stream (a lag
window over an unbounded stream has no finalization rule). Spark's
``F.session_window(ts, gap)`` is the streaming-native form: a dynamic-
length window per key that extends while events keep arriving within
``gap`` of the last one, backed by the merging-session state store
operator under Structured Streaming, and usable identically in batch —
which gives the batch/stream equivalence this engine pins for every
derived aggregate (tests/test_session_window.py).

Boundary semantics (pinned empirically in tests/test_session_window.py,
mirrored in the DuckDB oracle): the merge is INCLUSIVE — an event landing
at exactly ``prev_ts + gap`` (the session's nominal end) EXTENDS the
session. The lag-trick equivalent is therefore ``gap_delta > gap``
starts-new, the same ``>`` the batch sessionize query uses.

Scale shape: one hash exchange on the session key; Spark sorts each
partition by (key, ts) and merges runs linearly — state per key is one
open session, dropped at watermark under streaming. Session length is
bounded by activity, not corpus size, so state is O(live keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_window_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per (key, session): start, exclusive end, event count, value sum.

    Batch: call as-is. Streaming: pass ``watermark`` (required by Spark
    for session aggregation in append mode — sessions finalize when the
    watermark passes their end, the same late-drop contract as
    streaming/windowed.py documents for tumbling windows).
    """
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    sw = F.session_window(F.col(ts_col), gap)
    return (
        src.groupBy(sw, F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
