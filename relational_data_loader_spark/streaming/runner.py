"""Structured Streaming ingest: change-log tailer → foreachBatch MERGE.

The reference is a *polling* loader — each CLI run reads CHANGETABLE deltas
since the tracker's last version and applies them (SURVEY.md §3.2). This
module is that loop made resident: a Structured Streaming file source tails
the LSN-ordered change-log directory (micro-batch = ``maxFilesPerTrigger``
log segments, the reference's batch_size analog), and ``foreachBatch``
applies each micro-batch through exactly the same netting+merge path the
batch manager uses.

Exactly-once story (north_star):
- Spark's streaming checkpoint makes source progress durable and replays a
  failed micro-batch with the SAME epoch_id after restart;
- the sink's commit manifest records applied epoch ids atomically with the
  data commit, so a replayed epoch is a detected no-op (merge → skipped);
- together: at-least-once delivery × idempotent commit = exactly-once apply.
  The two pieces of state (checkpoint dir, target manifest) must be kept or
  deleted together — same contract as Delta/Iceberg + checkpoint.

Late events at/below the full-refresh BASELINE (a refresh raced the stream)
are dropped by an explicit filter; events above it may arrive in any order
(the file source batches by mtime, not lsn) and are applied correctly by the
sink's version-guarded merge — see sinks/snapshot.py "out-of-order safety".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import IngestSpec


class StreamingIngest:
    def __init__(
        self,
        manager: DataLoadManager,
        spec: IngestSpec,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        rows_per_file_hint: int = 250_000,
        stateful_dedup: bool = False,
        state_ttl_minutes: int | None = None,
    ):
        if spec.envelope != "full":
            # the stream path tolerates PERMUTED micro-batch segments (file
            # source orders by mtime, not lsn — see apply_batch); that is
            # safe for full after-images (version-guarded merge) but loses
            # column-level writes on sparse patches: the first-applied
            # segment's densified image would win whole-row over a
            # lower-lsn patch to a DIFFERENT column. The batch manager's
            # lsn-chunked loop applies in order — use that for sparse feeds.
            raise ValueError(
                f"spec {spec.name!r}: envelope='sparse' is batch-only; "
                "streaming segment permutation breaks column-level LWW"
            )
        if spec.on_cast_error == "quarantine" and not spec.source.startswith(
            "csv://"
        ):
            # readStream demands a schema for file sources, so only a TEXT
            # wire can be read untyped for the lossy-cast flags: a parquet
            # stream with mistyped physical columns fails the scan before
            # any flag runs, and the debezium parser types inside from_json
            # (malformed fields null silently, the raw value is gone). The
            # batch manager reads parquet schema-less — route those there.
            raise ValueError(
                f"spec {spec.name!r}: on_cast_error='quarantine' streams "
                "only over csv:// sources; parquet/debezium poison "
                "handling needs the batch manager's raw scan"
            )
        self.mgr = manager
        self.spec = spec
        self.checkpoint_dir = checkpoint_dir
        # opt-in cross-batch per-PK monotone-LSN filter (state_filter.py):
        # kills re-delivered/stale events before the merge shuffle. State is
        # one long per live PK — size the state store accordingly.
        self.stateful_dedup = stateful_dedup
        # bounds the dedup state to keys active within the TTL; evicted
        # keys fall back to the sink's version guard (state_filter.py)
        self.state_ttl_minutes = state_ttl_minutes
        if max_files_per_trigger is None:
            # derive micro-batch size from the spec's batch_size (the
            # reference C2 knob): the file source is bounded in files, not
            # rows, so convert via a declared rows-per-log-segment hint
            max_files_per_trigger = max(1, spec.batch_size // rows_per_file_hint)
        self.max_files_per_trigger = max_files_per_trigger

    # -- micro-batch apply (also unit-testable without a running stream) ----

    def apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        import os

        table = self.mgr.table(self.spec)
        if os.environ.get("RDL_DEBUG_STREAM"):
            from pyspark.sql import functions as _F

            r = batch_df.agg(
                _F.min(self.spec.lsn_column), _F.max(self.spec.lsn_column),
                _F.count(_F.lit(1)),
            ).collect()[0]
            wm = table.watermark() if table.exists() else None
            print(
                f"[rdl-stream] {self.spec.name} epoch={epoch_id} "
                f"lsn=[{r[0]},{r[1]}] n={r[2]} wm_before={wm}",
                flush=True,
            )
        if not table.exists():
            # bootstrap an empty snapshot so merge has a base (the reference
            # creates the destination table before its first batch — W5)
            table.full_refresh(
                self.mgr.spark.createDataFrame([], self.spec.destination_schema()),
                epoch_id=-1,
                watermark=-1,
                namespace="stream",
            )
        # drop only events the full-refresh BASELINE already covers — a
        # baseline snapshot subsumes its whole lsn range. Events above it are
        # NEVER dropped here: the file source orders micro-batches by file
        # mtime, not lsn, so around a kill/resume a later-lsn segment can
        # arrive first; the sink's version-guarded merge (sinks/snapshot.py)
        # applies permuted segments correctly in any order. (Round-2 fix: a
        # global max-watermark drop here silently lost permuted segments.)
        batch_df = batch_df.filter(
            F.col(self.spec.lsn_column) > F.lit(table.baseline_watermark())
        )
        # dead-letter split per micro-batch ("s<batchId>" DLQ dirs): the
        # foreachBatch epoch_id is Structured Streaming's batchId, which is
        # stable across a checkpoint-replayed micro-batch — the overwrite
        # is idempotent exactly like the batch path's lsn-keyed dirs
        n_quar = 0
        if self.spec.on_cast_error == "quarantine":
            batch_df, n_quar = self.mgr._quarantine_split(
                self.spec, batch_df, int(epoch_id), prefix="s"
            )
        batch = self.mgr.merge_batch(self.spec, batch_df, self.spec.salt_buckets)
        # "stream" namespace: Structured Streaming batchIds count 0,1,2,…
        # while batch-manager epochs are log positions — an un-namespaced
        # shared set would let a long-lived stream's batchId hit a committed
        # batch LSN and silently drop that micro-batch
        stats = table.merge(batch, int(epoch_id), namespace="stream")
        if os.environ.get("RDL_DEBUG_STREAM"):
            m = getattr(table, "current_manifest", dict)() or {}
            print(
                f"[rdl-stream] {self.spec.name} epoch={epoch_id} merged: "
                f"skipped={stats.skipped} ups={stats.rows_upserted} "
                f"dels={stats.rows_deleted} touched={stats.touched_buckets} "
                f"wm_after={stats.watermark} manifest_v={m.get('version')} "
                f"buckets={sorted(m.get('buckets', {}))}",
                flush=True,
            )
        if not stats.skipped:
            self.mgr.state.append(
                self.spec.name,
                int(epoch_id),
                stats.bucket_stats or [],
                stats.wall_ms,
                kind="stream_merge",
            )

    # -- stream lifecycle ------------------------------------------------------

    def start(self, available_now: bool = True) -> StreamingQuery:
        """Tail the change-log directory as a stream.

        File sources: ``parquet://`` (the lake-native log), ``csv://``
        (the reference's CsvDataSource S4, streamed) and ``debezium://``
        (JSON-lines Debezium envelopes, the binlog/WAL wire format —
        sources/debezium.py; parsed inside the stream so the foreachBatch
        apply path is byte-identical to the other schemes). A polled *database*
        source (the reference's primary mode, S2) intentionally has no
        readStream analog — Spark's JDBC source is batch-only — and maps to
        repeated batch runs instead: ``cli.py --stream --once`` drains the
        log and exits, and each batch-mode ``manager.run`` is one CT poll
        (watermark → CHANGETABLE-analog scan → merge). That equivalence is
        tested in tests/test_streaming.py::test_jdbc_style_poll_loop.
        """
        # registry gate at producer startup: a resident stream applies the
        # SAME spec for its whole life, so a forbidden evolution is caught
        # once here, before the first micro-batch, with the table untouched
        # (spec.py check_compat; the batch path gates in manager.run)
        if self.spec.compat_level != "none":
            table = self.mgr.table(self.spec)
            stored_json = table.stored_spec_json() if table.exists() else None
            if stored_json is not None:
                from relational_data_loader_spark.spec import (
                    CompatibilityError,
                    IngestSpec,
                )

                old = IngestSpec.from_json(stored_json)
                if old.checksum() != self.spec.checksum():
                    violations = self.spec.check_compat(old)
                    if violations:
                        raise CompatibilityError(
                            self.spec.name, self.spec.compat_level, violations
                        )
        if available_now and self.state_ttl_minutes is not None:
            # measured, not theoretical: processing-time timers make the
            # stateful operator report pending work every trigger, so an
            # availableNow run schedules empty drain micro-batches FOREVER
            # (observed 160+ zero-data batches with all timers already
            # cleared). TTL eviction is a resident-stream feature; a
            # poll-style drain should run without it (state carried in the
            # checkpoint is bounded by what the resident runs evicted).
            raise ValueError(
                "state_ttl_minutes requires a resident stream "
                "(start(available_now=False)): processing-time timeouts "
                "prevent availableNow triggers from ever terminating"
            )
        scheme, _, path = self.spec.source.partition("://")
        if scheme == "kafka":
            # Debezium topic tail (sources/kafka.py, jar-gated);
            # maxOffsetsPerTrigger in the URI bounds the micro-batch the way
            # maxFilesPerTrigger bounds the file sources
            from relational_data_loader_spark.sources.kafka import kafka_stream

            stream = kafka_stream(self.mgr.spark, self.spec.source, self.spec)
        elif scheme == "debezium":
            # text-source tail + the same parser the batch path uses; the
            # envelope supplies the schema, so no .schema() on the reader
            from relational_data_loader_spark.sources.debezium import parse_debezium

            raw = (
                self.mgr.spark.readStream.option(
                    "maxFilesPerTrigger", self.max_files_per_trigger
                )
                .option("latestFirst", "false")
                .text(path)
            )
            stream = parse_debezium(raw, self.spec)
        else:
            # quarantine mode tails the text wire untyped so lossy values
            # reach the flags instead of failing/nulling in the scan
            # (csv-only — the __init__ gate rejects the other schemes)
            stream_schema = (
                self.spec.untyped_change_schema()
                if self.spec.on_cast_error == "quarantine"
                else self.spec.change_schema()
            )
            reader = (
                self.mgr.spark.readStream.schema(stream_schema)
                .option("maxFilesPerTrigger", self.max_files_per_trigger)
                .option("latestFirst", "false")
            )
            if scheme == "parquet":
                stream = reader.parquet(path)
            elif scheme == "csv":
                # the engine's csv conventions, shared verbatim with the batch
                # reader (sources/readers.py CSV_OPTIONS) so batch replay and
                # streaming replay of the same log cannot desync
                from relational_data_loader_spark.sources.readers import CSV_OPTIONS

                stream = reader.options(**CSV_OPTIONS).csv(path)
            else:
                raise ValueError(
                    f"streaming source must be parquet://, csv://, "
                    f"debezium:// or kafka://, got {scheme!r} "
                    "(database sources poll via batch runs — see docstring)"
                )
        if self.stateful_dedup:
            from relational_data_loader_spark.streaming.state_filter import (
                monotone_lsn_filter,
            )

            stream = monotone_lsn_filter(
                stream, self.spec, ttl_minutes=self.state_ttl_minutes
            )
        writer = (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(f"rdl-ingest-{self.spec.name}")
        )
        if self.stateful_dedup:
            # the stateful operator emits in Update mode; the query-level
            # output mode must match (foreachBatch accepts update)
            writer = writer.outputMode("update")
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_until_caught_up(self) -> None:
        """Process everything currently in the log, then stop (poll-style run)."""
        q = self.start(available_now=True)
        q.awaitTermination()
