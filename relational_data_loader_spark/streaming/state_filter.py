"""Cross-batch stateful dedup: per-PK monotone-LSN filter for the stream.

The sink's version-guarded merge (sinks/snapshot.py) already makes stale and
duplicate events a per-row no-op — but only after they have ridden the full
merge path (netting shuffle + target join). With an at-least-once upstream
(a Kafka/Debezium tail re-delivering segments, overlapping log dumps), the
same events can arrive across MANY micro-batches; at 10^10 events that is
pure wasted shuffle. This operator hoists the sink's sequence guard into the
stream: Spark keeps a per-primary-key ``max_lsn`` in the state store, and
events at-or-below it are dropped before the merge ever sees them.

Semantics: dropping ``lsn <= state.max_lsn`` is exactly what the sink's
``s.lsn > t._rdl_lsn`` guard would do — for upserts AND deletes (a stale D
is superseded by whatever newer event advanced the state) — so final table
state is unchanged; only wasted work is removed. Within one micro-batch all
rows above the *prior* state pass (no intra-batch ordering assumption); the
sink's fused LWW netting handles intra-batch duplicates as before.

Crash safety: the state store is versioned per micro-batch. A replayed batch
(failure before the streaming commit) re-runs against the PREVIOUS state
version, so its events still pass the filter and hit the sink, whose
applied-epoch manifest makes the re-apply a no-op — the exactly-once story
of streaming/runner.py is unchanged.

Scale: state is one long per live PK. At 10^9 live keys that is tens of GB
across the cluster — fine for RocksDB state stores
(``spark.sql.streaming.stateStore.providerClass``), meaningful for the
default in-memory HDFS-backed store; the operator is therefore OPT-IN
(``StreamingIngest(..., stateful_dedup=True)``).

State granularity vs group granularity: ``applyInPandasWithState`` pays a
fixed per-GROUP Python cost (state decode/encode + pandas frame assembly)
every micro-batch, so grouping on the full fine-grained PK makes the cost
proportional to DISTINCT PKS per batch — measured 55 s for a 46k-PK batch
(~1.2 ms/group) on the r5 bench's single-batch replay, 30x the rest of the
pipeline. For a composite PK the filter therefore groups on the LEADING
key (conv_id) and keeps the per-PK max-lsn map for that conversation
INSIDE the state row as parallel arrays — groups drop from (keys) to
(conversations), the per-key guard stays exact, and the inner filter is
vectorized pandas. State per group is O(turns of that conversation) — the
transcript domain bounds it (a conversation's turn count is context-bound),
and a hot conversation's per-batch work is bounded by its events in that
batch, the same bound the merge shuffle has.

This is the engine's ``applyInPandasWithState`` surface: Arrow-batched
pandas per group-partition, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from relational_data_loader_spark.spec import IngestSpec

_STATE_SCHEMA = T.StructType([T.StructField("max_lsn", T.LongType(), True)])

# composite-PK state: per-conversation map {remaining-PK -> max_lsn} as
# parallel arrays (applyInPandasWithState state rows are flat structs; a
# MapType field is not portable across state-store encodings)
_MAP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sub_keys", T.ArrayType(T.StringType()), True),
        T.StructField("max_lsns", T.ArrayType(T.LongType()), True),
    ]
)

# joins the non-leading PK values into one state key; PKs are scalar
# identifiers (spec validation forbids nullable PKs) and \x1f never occurs
# in identifier-like values — document, don't pay a per-row escape
_SUBKEY_SEP = "\x1f"


def monotone_lsn_filter(
    stream: DataFrame, spec: IngestSpec, ttl_minutes: int | None = None
) -> DataFrame:
    """Drop events at-or-below the per-PK high-water LSN seen so far.

    Works on a streaming DataFrame with the spec's change schema; returns
    the same schema. Batch DataFrames should use the sink's guard directly
    (state needs a stream).

    Single-column PK: one state row per key (scalar max_lsn). Composite PK:
    one state row per LEADING key holding the per-subkey max-lsn map — see
    the module docstring's group-granularity argument (a 46k-group batch
    costs ~55 s in per-group overhead alone; the coarse grouping removes
    exactly that, the guard stays per-PK exact).

    ``ttl_minutes`` bounds the state: a group idle for that long is
    EVICTED (processing-time timeout). Without it, state is one row per
    key EVER SEEN — unbounded over a 10^10-event tail whose key space
    grows (every new conversation adds a row forever). Eviction is safe
    because this filter is an optimization, not the correctness guard: a
    re-delivered event for an evicted key passes the filter and rides the
    merge, where the sink's version-guarded MERGE + applied-epoch manifest
    no-op it — exactly the path it would have taken with the filter off.
    The TTL trades that wasted merge work (only for re-deliveries older
    than the TTL, which real tails deliver within minutes) for an O(live
    keys within TTL) state bound. Timeouts fire between micro-batches, so
    a TTL of 0 means "evict at the next batch boundary". Resident streams
    only: processing-time timers keep an availableNow trigger scheduling
    empty drain batches forever, so ``StreamingIngest.start`` refuses the
    combination (see its guard).
    """
    lsn = spec.lsn_column
    out_schema = stream.schema
    pks = list(spec.source_primary_keys)

    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl_ms = (
        None if ttl_minutes is None else max(1, int(ttl_minutes) * 60_000)
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    if len(pks) == 1:

        def dedup(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
            if ttl_ms is not None and state.hasTimedOut:
                state.remove()
                return
            prior = state.get[0] if state.exists else -1
            if prior is None:
                prior = -1
            mx = prior
            for pdf in pdf_iter:
                keep = pdf[pdf[lsn] > prior]
                if len(keep):
                    batch_max = int(keep[lsn].max())
                    if batch_max > mx:
                        mx = batch_max
                    yield keep
            if mx > prior:
                state.update((mx,))
            if ttl_ms is not None and state.exists:
                state.setTimeoutDuration(ttl_ms)

        return stream.groupBy(*pks).applyInPandasWithState(
            dedup,
            out_schema,
            _STATE_SCHEMA,
            "update",
            timeout_conf,
        )

    sub_pks = pks[1:]

    def dedup_map(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            sub_keys, max_lsns = state.get
            prior: dict[str, int] = dict(zip(sub_keys or [], max_lsns or []))
        else:
            prior = {}
        updated: dict[str, int] = {}
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            sub = pdf[sub_pks[0]].astype(str)
            for c in sub_pks[1:]:
                sub = sub + _SUBKEY_SEP + pdf[c].astype(str)
            # vectorized per-subkey guard against the PRIOR state only —
            # intra-batch duplicates pass (the sink's fused LWW netting
            # handles them), identical to the fine-grained variant
            floor = sub.map(prior).fillna(-1).astype("int64")
            mask = pdf[lsn].astype("int64") > floor
            keep = pdf[mask]
            if len(keep):
                for k, v in keep[lsn].groupby(sub[mask].values).max().items():
                    k, v = str(k), int(v)  # plain python for the state row
                    if v > updated.get(k, -1):
                        updated[k] = v
                yield keep
        advanced = {
            k: v for k, v in updated.items() if v > prior.get(k, -1)
        }
        if advanced:
            prior.update(advanced)
            state.update((list(prior.keys()), list(prior.values())))
        if ttl_ms is not None and state.exists:
            state.setTimeoutDuration(ttl_ms)

    return stream.groupBy(pks[0]).applyInPandasWithState(
        dedup_map,
        out_schema,
        _MAP_STATE_SCHEMA,
        "update",
        timeout_conf,
    )
