"""Change-log compaction — the Kafka log-compaction analog for the
file-backed change log the engine tails.

A long-lived CDC tail accretes segments forever; replaying the full log to
bootstrap a new destination (or a dev clone) eventually costs O(history)
instead of O(live keys). Compaction rewrites the log's PREFIX to one netted
segment — the max-lsn event per primary key, original lsns preserved, op
carried through (DELETE winners are KEPT as tombstone events, Kafka-style:
a bootstrap of a destination that might hold older state needs them; an
empty-table bootstrap merges them as no-ops) — so the log stays
replay-equivalent under the engine's LWW semantics while shrinking to
O(live keys + tail).

Why replay equivalence holds for EVERY consumer watermark w, not just
fresh bootstraps: any event e netted away had a winner e' on the same key
with lsn(e') > lsn(e). If w >= lsn(e'), the destination already applied e'
(nothing to re-apply); if w < lsn(e'), the winner survives compaction and
the version-guarded merge applies it, superseding whatever e would have
left behind. The only interaction is the CT probe's min-valid rule
(sources/readers.py change_tracking_info): compaction can RAISE the log's
min lsn, which a destination with an older watermark reads as head
truncation and answers with a full refresh — conservative (the replay is
still correct, it just rebuilds), never wrong; tests pin both routes.

Crash safety is write-first, delete-second, whole segments only: the
compacted segment lands (tmp dir + atomic renames into the log dir) BEFORE
any consumed segment is removed. A crash in between leaves every prefix
event present twice — the LWW net makes duplicates harmless on replay (the
same argument as the manager's DLQ replay), and re-running compaction
consumes both copies. Only segments whose footer max-lsn <= below_lsn are
consumed (footer reads only — no data pages), so the tail is never
rewritten and an lsn-straddling segment simply waits for the next pass.
"""

from __future__ import annotations

import glob
import os
import uuid

import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from relational_data_loader_spark.operators.lww import net_changes


def _footer_max(path: str, lsn_col: str) -> int:
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index(lsn_col)
    return max(
        md.row_group(g).column(idx).statistics.max
        for g in range(md.num_row_groups)
    )


def compact_change_log(
    spark: SparkSession,
    log_dir: str,
    below_lsn: int,
    primary_keys: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> dict:
    """Compact every whole segment with max lsn <= ``below_lsn`` into one
    netted segment. Returns ``{"segments_consumed", "rows_in", "rows_out",
    "skipped"}``; a no-op (fewer than 2 eligible segments — nothing to
    fold) reports ``skipped=True`` and touches nothing."""
    files = sorted(glob.glob(os.path.join(log_dir, "*.parquet")))
    consumed = [f for f in files if _footer_max(f, lsn_col) <= int(below_lsn)]
    if len(consumed) < 2:
        return {
            "segments_consumed": 0,
            "rows_in": 0,
            "rows_out": 0,
            "skipped": True,
        }
    rows_in = sum(pq.ParquetFile(f).metadata.num_rows for f in consumed)

    netted = net_changes(
        spark.read.parquet(*consumed), primary_keys, lsn_col, op_col
    )
    tmp = os.path.join(log_dir, f".compact-tmp-{uuid.uuid4().hex}")
    netted.write.mode("overwrite").parquet(tmp)

    # atomic-per-file publication: rename the part files into the log dir
    # under a name the tail's "log-*" segments sort away from, THEN drop
    # the consumed prefix. rename(2) within one directory never leaves a
    # half-visible file.
    rows_out = 0
    stamp = f"compacted-{int(below_lsn):012d}-{uuid.uuid4().hex[:8]}"
    for i, part in enumerate(
        sorted(glob.glob(os.path.join(tmp, "*.parquet")))
    ):
        rows_out += pq.ParquetFile(part).metadata.num_rows
        os.rename(part, os.path.join(log_dir, f"{stamp}-{i:05d}.parquet"))
    for f in consumed:
        os.remove(f)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "segments_consumed": len(consumed),
        "rows_in": rows_in,
        "rows_out": rows_out,
        "skipped": False,
    }
