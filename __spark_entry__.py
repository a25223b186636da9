"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All pairs live in ``relational_data_loader_spark.queries`` (one entry per
implemented operator from SURVEY.md §2 + the training-data-pipeline ops);
this module is just the adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from relational_data_loader_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full change-log replay to final state (LWW net + delete
    propagation — the engine's core CDC apply) on sf0.001."""
    fn, _ = QUERIES["cdc_apply_final_state"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
