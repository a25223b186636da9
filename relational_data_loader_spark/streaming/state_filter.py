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
(``StreamingIngest(..., stateful_dedup=True)``). The groupBy shuffles on the
full fine-grained PK — the same key the merge shuffles on, uniform by
construction, so no new skew surface.

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


def monotone_lsn_filter(stream: DataFrame, spec: IngestSpec) -> DataFrame:
    """Drop events at-or-below the per-PK high-water LSN seen so far.

    Works on a streaming DataFrame with the spec's change schema; returns
    the same schema. Batch DataFrames should use the sink's guard directly
    (state needs a stream).
    """
    lsn = spec.lsn_column
    out_schema = stream.schema

    def dedup(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
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

    from pyspark.sql.streaming.state import GroupStateTimeout

    # the change stream carries SOURCE column names (spec.change_schema);
    # destination names only coincide when the spec doesn't rename its PKs
    return stream.groupBy(*spec.source_primary_keys).applyInPandasWithState(
        dedup,
        out_schema,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
