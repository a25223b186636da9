"""SparkSession factory with scale-oriented defaults.

The reference is a single-process, single-threaded copier (SURVEY.md §3);
the session config here is where our engine's parallel execution model is
pinned: AQE on (runtime coalesce + skew-join splitting), Arrow on (all
Python crossings are vectorized), shuffle partitions sized to cores for
local mode, UTC timezone so results compare bit-for-bit with the DuckDB
oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rdl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("RDL_SPARK_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[*]" and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # 2 partitions per core: halves per-task sort memory (local mode
        # shares one heap across all task threads) at negligible cost
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = max(2 * int(master[6:-1]), 4)
        else:
            shuffle_partitions = 2 * (os.cpu_count() or 32)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # bound per-task input so partitions fit executor memory at scale
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # min/max/count probes (change-tracking info) answer from parquet
        # footers instead of scanning data
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # write timestamps as TIMESTAMP_MICROS, not the deprecated INT96:
        # INT96 columns carry NO footer min/max statistics, which blinds
        # both row-group pruning and the snapshot sink's manifest zone maps
        # (read_range) on every ts column
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("RDL_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.parallelPartitionDiscovery.parallelism", "32")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
