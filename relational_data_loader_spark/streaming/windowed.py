"""Event-time windowed aggregation with watermark late-drop.

The ingest path (runner.py) applies every event regardless of event time —
CDC correctness wants all of them, however late (the version guard orders
them). Derived STREAMING AGGREGATES are different: they must emit finalized
results and bound their state, which is exactly Spark's watermark contract —
``withWatermark(ts, delay)`` + ``window(ts, size)``:

- state for a window is kept only until the watermark (max event time seen
  minus ``delay``) passes its end, then the window finalizes (emits in
  append mode) and its state is dropped;
- an event arriving after its window finalized is DROPPED from the
  aggregate — the documented trade for bounded state at 10^10 events.

Spark's guarantee here is deliberately one-sided (and ours inherits it):
events within the allowance are NEVER dropped, but an event beyond the
allowance may still be aggregated if it lands in the same micro-batch in
which its window finalizes (eviction runs at batch end, after the merge).
Only once the state is evicted is the drop certain. Append emission stays
exactly-once per window either way — what varies is whether a
boundary-straddling late event made it in (tests/test_windowed_stream.py
pins both sides of the boundary).

This module derives per-window per-role turn statistics from the transcript
change stream — the "activity rollup" a transcript lake serves next to the
table itself. Everything is built-in column expressions; state size is
O(open windows × roles), independent of event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relational_data_loader_spark.spec import IngestSpec


def windowed_turn_stats(
    stream: DataFrame,
    spec: IngestSpec,
    window_size: str = "5 minutes",
    late_allowance: str = "10 minutes",
    ts_col: str = "ts",
    role_col: str = "role",
    slide: str | None = None,
) -> DataFrame:
    """Per (event-time window, role) upsert/delete counts over the change
    stream, watermarked so state stays bounded.

    Returns columns: window_start, window_end, role, n_upserts, n_deletes,
    n_convs (distinct conversations touched, approx_count_distinct — exact
    distincts are unsupported in streaming and unnecessary for a rollup).
    Works in batch mode too (the watermark is a no-op there), which is what
    the equivalence test uses as its oracle.

    ``slide`` turns the tumbling window into a SLIDING (hopping) one —
    each event lands in size/slide windows; streaming state grows by the
    same factor (still O(open windows × roles)), and finalization is per
    window end exactly as for tumbling, so append-mode semantics carry
    over unchanged (pinned by the batch/stream equivalence test).
    """
    op = spec.op_column
    delete = spec.delete_op
    win = (
        F.window(F.col(ts_col), window_size, slide)
        if slide
        else F.window(F.col(ts_col), window_size)
    )
    df = stream.withWatermark(ts_col, late_allowance) if stream.isStreaming else stream
    return (
        df.groupBy(win.alias("w"), F.col(role_col).alias("role"))
        .agg(
            F.sum(F.when(F.col(op) != delete, 1).otherwise(0)).alias("n_upserts"),
            F.sum(F.when(F.col(op) == delete, 1).otherwise(0)).alias("n_deletes"),
            # change-stream columns carry SOURCE names (spec.change_schema)
            F.approx_count_distinct(spec.source_primary_keys[0]).alias("n_convs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_upserts",
            "n_deletes",
            "n_convs",
        )
    )
