"""Source dispatch + change-log scan + change-tracking probe.

Reference mapping (SURVEY.md §2.1):
- S5 source dispatch: connection-string-prefix factory
  (``modules/data_sources/DataSourceFactory.py::create_source`` — ``mssql+pyodbc://``
  vs ``csv://``). Ours dispatches on a URI scheme: ``parquet://``, ``csv://``,
  ``jdbc://`` (gated: needs a driver jar).
- S1/S2 scans: the reference keyset-paginates with ``SELECT TOP(n) … WHERE pk > ?``;
  Spark's partitioned columnar scan replaces pagination wholesale — bounded
  memory per task comes from ``spark.sql.files.maxPartitionBytes``, restart
  comes from the commit manifest, not a cursor.
- S3 change-tracking probe: ``CHANGE_TRACKING_CURRENT_VERSION()`` /
  ``CHANGE_TRACKING_MIN_VALID_VERSION()`` become a min/max aggregate over the
  change log's lsn column. The min is parquet-footer-only (statistics), so
  the probe never scans data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from relational_data_loader_spark.spec import IngestSpec


def read_source(
    spark: SparkSession, uri: str, schema: T.StructType | None = None
) -> DataFrame:
    """URI-scheme dispatch, the factory pattern of the reference's S5."""
    scheme, _, path = uri.partition("://")
    if scheme == "parquet":
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(path)
    if scheme == "csv":
        r = spark.read.option("header", "true")
        if schema is not None:
            r = r.schema(schema)
        else:
            r = r.option("inferSchema", "true")
        return r.csv(path)
    if scheme == "jdbc":
        # real-cluster path for an MSSQL/Postgres source; needs the driver jar
        # on the classpath, so it is exercised only where one exists.
        return spark.read.format("jdbc").option("url", path).load()
    raise ValueError(f"unknown source scheme {scheme!r} in {uri!r}")


def read_change_log(spark: SparkSession, spec: IngestSpec) -> DataFrame:
    """Batch scan of the LSN-ordered change log for this spec's source."""
    return read_source(spark, spec.source, spec.change_schema())


@dataclass
class ChangeTrackingInfo:
    current_version: int       # max lsn present in the log
    min_valid_version: int     # min lsn retained in the log
    force_full: bool           # last synced < min valid ⇒ incremental unsafe


def change_tracking_info(
    log: DataFrame, last_synced: int, lsn_col: str = "lsn"
) -> ChangeTrackingInfo:
    """The reference's get_change_tracking_info (S3) over a log DataFrame.

    ``last_synced < min_valid - 1`` means the log head was truncated past our
    watermark: events we never applied are gone, so incremental apply would
    silently lose them — force a full refresh (SURVEY.md §1.3 invariant 6).
    """
    row = log.agg(
        F.max(lsn_col).alias("cur"), F.min(lsn_col).alias("mn")
    ).collect()[0]
    cur = row["cur"] if row["cur"] is not None else -1
    mn = row["mn"] if row["mn"] is not None else -1
    force = last_synced >= 0 and mn >= 0 and last_synced < mn - 1
    if last_synced < 0:
        force = True  # never synced ⇒ initial full load
    return ChangeTrackingInfo(cur, mn, force)
