"""IcebergSink — the production sink: MERGE INTO an Iceberg table.

This sandbox has no Iceberg runtime jars and no network (SURVEY.md §7.4),
so this module is code-complete but only exercised where the jars exist
(``iceberg_available()`` gates it; tests fall back to SnapshotTable, which
implements the same contract over plain parquet; the exactly-once plumbing
here IS unit-tested against a recording fake — tests/test_iceberg_sink.py).
On a real cluster:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<path> ...

Design notes for the 10^10-event target:
- table partitioned by ``bucket(N, conv_id)`` so MERGE's join co-locates
  with storage and file-level pruning applies (the SnapshotTable bucket
  layout is the parquet re-implementation of exactly this);
- merge-on-read (``write.merge.mode=merge-on-read``) turns per-epoch bucket
  rewrites into delete-file appends, compacted asynchronously;
- rename/add-column are metadata-only (field-id based), which is why the
  engine's evolution policy maps the reference's "model config change" to
  Iceberg DDL instead of a reload.

Exactly-once bookkeeping — the one-commit rule
----------------------------------------------
The epoch id and watermark are stamped into the **snapshot summary of the
data commit itself**, via Iceberg's write-audit-publish session conf
``spark.wap.id``: any Iceberg write that runs while it is set records its
value as the snapshot-summary key ``wap.id`` (public Iceberg Spark
behavior; with ``write.wap.enabled`` left false — which ``ensure_table``
guarantees — the snapshot publishes normally). That gives us an arbitrary
string carried atomically with MERGE INTO / INSERT OVERWRITE, with no
second ``ALTER TABLE`` commit and therefore no crash window between data
and bookkeeping. The read side (``applied_epochs`` / ``watermark``) parses
the SAME key back from the ``.snapshots`` metadata table; the payload
format is owned by ``_encode_stamp``/``_decode_stamp`` so writer and reader
cannot drift.

Epoch keys are namespaced exactly like SnapshotTable manifests
(``batch:<lsn>`` vs ``stream:<batchId>``) — see sinks/snapshot.py.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from relational_data_loader_spark.sinks.snapshot import (
    DELETED_COL,
    LSN_COL,
    epoch_key,
)
from relational_data_loader_spark.spec import AUDIT_EXEC_ID, AUDIT_LOADED_AT, IngestSpec

_WAP_CONF = "spark.wap.id"
_STAMP_PREFIX = "rdl/"


def _encode_stamp(key: str, watermark: int) -> str:
    """Snapshot-summary payload: ``rdl/<namespace>:<epoch>/<watermark>``."""
    return f"{_STAMP_PREFIX}{key}/{int(watermark)}"


def _decode_stamp(payload: str | None) -> tuple[str, int] | None:
    """Inverse of ``_encode_stamp``; None for foreign/absent wap ids."""
    if not payload or not payload.startswith(_STAMP_PREFIX):
        return None
    body = payload[len(_STAMP_PREFIX):]
    key, sep, wm = body.rpartition("/")
    if not sep:
        return None
    try:
        return key, int(wm)
    except ValueError:
        return None


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergTable:
    """Same contract as SnapshotTable, implemented with Iceberg SQL."""

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        spec: IngestSpec,
        check_runtime: bool = True,
    ):
        if check_runtime and not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use SnapshotTable "
                "(sinks/snapshot.py) in jar-less environments"
            )
        self.spark = spark
        self.identifier = identifier  # e.g. lake.db.transcripts
        self.spec = spec

    # -- DDL (reference W5: create_schema/create_table from model JSON) -----

    def ensure_table(self) -> None:
        # physical schema = destination (+audit) + the version/tombstone
        # columns that make MERGE sequence-guarded (out-of-order safety —
        # same contract as SnapshotTable's _storage_schema)
        cols = ", ".join(
            [
                f"{f.name} {f.dataType.simpleString()}"
                for f in self.spec.destination_schema().fields
            ]
            + [f"{LSN_COL} bigint", f"{DELETED_COL} boolean"]
        )
        # 'write.wap.enabled' must stay false: the epoch stamp rides the
        # spark.wap.id conf, and enabling WAP would STAGE commits instead of
        # publishing them (see module docstring)
        self.spark.sql(
            f"""
            CREATE TABLE IF NOT EXISTS {self.identifier} ({cols})
            USING iceberg
            PARTITIONED BY (bucket({self.spec.target_buckets}, {self.spec.primary_keys[0]}))
            TBLPROPERTIES (
              'write.merge.mode' = 'merge-on-read',
              'write.update.mode' = 'merge-on-read',
              'write.delete.mode' = 'merge-on-read',
              'write.distribution-mode' = 'hash',
              'write.wap.enabled' = 'false'
            )
            """
        )

    # -- exactly-once epoch bookkeeping -------------------------------------

    @contextmanager
    def _stamped(self, key: str, watermark: int):
        """Run a write with the epoch stamp riding the commit (atomic)."""
        self.spark.conf.set(_WAP_CONF, _encode_stamp(key, watermark))
        try:
            yield
        finally:
            self.spark.conf.unset(_WAP_CONF)

    def _snapshot_stamps(self) -> list[tuple[str, int]]:
        rows = self.spark.sql(
            f"SELECT summary['wap.id'] AS stamp FROM {self.identifier}.snapshots"
        ).collect()
        out = []
        for r in rows:
            decoded = _decode_stamp(r["stamp"])
            if decoded is not None:
                out.append(decoded)
        return out

    def applied_epochs(self) -> set[str]:
        """Namespaced epoch keys of every committed snapshot (replay guard)."""
        return {key for key, _ in self._snapshot_stamps()}

    def watermark(self) -> int:
        stamps = self._snapshot_stamps()
        return max((wm for _, wm in stamps), default=-1)

    # -- MERGE (reference W1 upsert + W2 delete fused) -----------------------

    def merge(
        self,
        netted: DataFrame,
        epoch_id: int,
        watermark: int,
        namespace: str = "batch",
    ) -> bool:
        """Apply a netted batch via a single sequence-guarded MERGE INTO.
        Returns False if the epoch was already applied (idempotent replay).
        The epoch/watermark stamp commits atomically with the MERGE snapshot
        (module docstring).

        Out-of-order safety (same contract as SnapshotTable): every UPDATE is
        guarded by ``s.lsn > t._rdl_lsn`` so a stale permuted segment can
        never overwrite newer state, and deletes are SOFT (tombstone rows,
        ``_rdl_deleted``) so a stale insert cannot resurrect a newer delete.
        Readers go through ``create_reader_view()``."""
        key = epoch_key(epoch_id, namespace)
        if key in self.applied_epochs():
            return False
        spec = self.spec
        on = " AND ".join(f"t.{k} = s.{k}" for k in spec.primary_keys)
        lsn, op = spec.lsn_column, spec.op_column
        guard = f"s.{lsn} > t.{LSN_COL}"
        # per-row audit stamps (P3) are literals of THIS epoch — the netted
        # batch doesn't carry them; epoch-derived so replays are byte-stable
        audit_sets = {
            AUDIT_EXEC_ID: f"{int(epoch_id)}L",
            AUDIT_LOADED_AT: f"timestamp_seconds({int(epoch_id)})",
        }
        audit_set_sql = [f"t.{f.name} = {audit_sets[f.name]}" for f in spec.audit_fields]
        upd_sets = ", ".join(
            [f"t.{c} = s.{c}" for c in spec.payload_columns]
            + [f"t.{LSN_COL} = s.{lsn}", f"t.{DELETED_COL} = false"]
            + audit_set_sql
        )
        del_sets = ", ".join(
            [f"t.{LSN_COL} = s.{lsn}", f"t.{DELETED_COL} = true"] + audit_set_sql
        )
        cols = ", ".join(
            [c.destination for c in spec.columns]
            + [f.name for f in spec.audit_fields]
            + [LSN_COL, DELETED_COL]
        )
        svals = ", ".join(
            [f"s.{c.destination}" for c in spec.columns]
            + [audit_sets[f.name] for f in spec.audit_fields]
            + [f"s.{lsn}", f"s.{op} = '{spec.delete_op}'"]
        )
        netted.createOrReplaceTempView("_rdl_batch")
        with self._stamped(key, watermark):
            self.spark.sql(
                f"""
                MERGE INTO {self.identifier} t
                USING _rdl_batch s
                ON {on}
                WHEN MATCHED AND {guard} AND s.{op} = '{spec.delete_op}'
                  THEN UPDATE SET {del_sets}
                WHEN MATCHED AND {guard} THEN UPDATE SET {upd_sets}
                WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({svals})
                """
            )
        return True

    def create_reader_view(self, view_name: str | None = None) -> str:
        """Published read surface: tombstones filtered, internals hidden."""
        view = view_name or f"{self.identifier}_live"
        visible = ", ".join(f.name for f in self.spec.destination_schema().fields)
        self.spark.sql(
            f"CREATE OR REPLACE VIEW {view} AS "
            f"SELECT {visible} FROM {self.identifier} WHERE NOT {DELETED_COL}"
        )
        return view

    def full_refresh(
        self,
        df: DataFrame,
        epoch_id: int,
        watermark: int,
        namespace: str = "batch",
    ) -> None:
        """Atomic snapshot swap: single INSERT OVERWRITE commit carrying the
        epoch stamp (W4)."""
        df.createOrReplaceTempView("_rdl_full")
        self.ensure_table()
        with self._stamped(epoch_key(epoch_id, namespace), watermark):
            # baseline rows are stamped with the covered watermark; any later
            # event must carry a higher lsn to win the guarded MERGE
            self.spark.sql(
                f"INSERT OVERWRITE {self.identifier} "
                f"SELECT *, CAST({int(watermark)} AS BIGINT) AS {LSN_COL}, "
                f"false AS {DELETED_COL} FROM _rdl_full"
            )
