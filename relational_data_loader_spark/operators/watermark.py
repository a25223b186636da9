"""Per-partition LSN watermarks.

Reference: the single scalar "last synced change version" stored in the
``data_load_tracker`` schema (``modules/data_load_tracking/DataLoadTracker.py``
— SURVEY.md §2.1 C3/S3). Our engine generalizes it to a *vector* of
watermarks, one per hash bucket of the primary key, as the north_star
requires — so a resumed job can prove per-partition progress and the
CT-invalid rule (min retained lsn > watermark + 1) is checkable per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_expr(key_col: str, n_buckets: int) -> F.Column:
    """Deterministic hash bucket of the partition key (xxhash64, JVM-side).

    This single expression defines data placement for the whole engine:
    the snapshot sink lays files out by it, merge prunes by it, and the
    watermark vector is keyed by it.
    """
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def partition_watermarks(
    batch: DataFrame,
    key_col: str,
    n_buckets: int,
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Per-bucket (partition_id, max_applied_lsn, rows_upserted, rows_deleted).

    One narrow groupBy over the netted batch; partial aggregation map-side.
    """
    return (
        batch.groupBy(bucket_expr(key_col, n_buckets).alias("partition_id"))
        .agg(
            F.max(lsn_col).alias("max_applied_lsn"),
            F.sum(F.when(F.col(op_col) != delete_op, 1).otherwise(0)).alias(
                "rows_upserted"
            ),
            F.sum(F.when(F.col(op_col) == delete_op, 1).otherwise(0)).alias(
                "rows_deleted"
            ),
        )
    )
