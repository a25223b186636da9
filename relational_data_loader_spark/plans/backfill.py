"""Chunked snapshot backfill for late-started tailers (DBLog-style).

The operational gap this closes: a CDC tailer that starts mid-stream (log
retention expired, a new downstream table, a re-pointed source) bootstraps
from whatever log window still exists and is then MISSING every key whose
last change predates that window. The classic fix — stop the world, dump
the whole source, then start tailing — is exactly what a 10^10-row table
cannot afford.

The public DBLog algorithm (Andreakis & Papapanagiotou, "DBLog: A
Watermark Based Change-Data-Capture Framework", Netflix, 2019; the design
Debezium ships as "incremental snapshots") interleaves the two instead:
read the source snapshot in small key-range chunks WHILE the change stream
keeps applying, and resolve snapshot-vs-stream races per chunk with
log-watermark windows.

This engine gets the same guarantee with less machinery because its merge
is already version-guarded (sinks/snapshot.py `merge`): every snapshot row
is presented as a change envelope carrying the row's OWN last-change lsn,
and the ordinary LWW window resolves every race —

- key absent from the target → the snapshot row lands (the backfill case);
- key updated by the stream (any order) → the stream's higher lsn wins;
- key deleted by the stream after the snapshot was read → the merge-path
  tombstone's higher lsn suppresses the snapshot insert (no resurrection);
- key deleted BEFORE the snapshot was read → it simply isn't in the
  snapshot (read the snapshot at-or-after the bootstrap point — the same
  freshness rule DBLog gets by selecting from the live table per chunk).

Chunking is therefore purely operational, and still essential at scale:
each chunk is one idempotent epoch in its own manifest namespace, so a
killed backfill resumes at the first unapplied chunk (exactly-once per
chunk via `applied_epochs`, like every other epoch); the per-chunk SELECT
bounds source load; and the per-chunk merge bounds shuffle size. The
caller interleaves normal incremental runs between chunks — the generator
yields control after every chunk for precisely that reason.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BACKFILL_NS = "backfill"


def backfill_chunks(
    table,
    snapshot_envelopes: DataFrame,
    key_col: str,
    n_chunks: int,
    namespace: str = _BACKFILL_NS,
) -> Iterator[tuple[int, object]]:
    """Merge a source snapshot into ``table`` in ``n_chunks`` key-hash
    chunks, yielding ``(chunk_idx, MergeStats)`` after each commit so the
    caller can interleave incremental change application between chunks.

    ``snapshot_envelopes``: the source rows in change-envelope shape
    (dest cols + lsn + op) where ``lsn`` is each row's last-change version
    at snapshot time and ``op`` is an upsert code. Rows must reflect the
    source AT OR AFTER the target's bootstrap point (see module docstring
    — staleness older than the bootstrap is the one race lsn-guarding
    cannot see, because the bootstrap's full-refresh baseline keeps no
    tombstones).

    Chunk assignment is ``xxhash64(key) % n_chunks`` — deterministic, so
    a resumed backfill re-derives identical chunks; the already-applied
    ones no-op through the epoch guard. Hash (not range) chunking keeps
    chunk sizes balanced under skewed key distributions without a
    quantile pass over the source.
    """
    if n_chunks < 1:
        raise ValueError(f"n_chunks must be >= 1, got {n_chunks}")
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_chunks))
    for k in range(n_chunks):
        chunk = snapshot_envelopes.filter(bucket == k)
        stats = table.merge(chunk, epoch_id=k, namespace=namespace)
        yield k, stats


def run_backfill(
    table,
    snapshot_envelopes: DataFrame,
    key_col: str,
    n_chunks: int,
    namespace: str = _BACKFILL_NS,
) -> list:
    """Drain ``backfill_chunks`` with no interleaving — the simple form
    for callers that only need resumability and bounded chunk size."""
    return [s for _, s in backfill_chunks(
        table, snapshot_envelopes, key_col, n_chunks, namespace
    )]
