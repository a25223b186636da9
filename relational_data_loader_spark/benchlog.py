"""JVM-side deterministic change-log generation for benchmarks.

The numpy fixture generator (fixtures.py) is exact about per-PK event
grammar, but single-threaded Python is the wrong tool at benchmark scale —
this module generates the same *shape* of log (skewed conv_ids, I/U/D mix,
NULL payload on deletes, text payload) entirely with Spark expressions:
``spark.range`` + hash functions, fully parallel, whole-stage codegen, no
Python in the loop. Determinism comes from xxhash64 over the lsn, not an RNG.

Skew profile matches FIXTURES.md F1: ~1% of conv ids receive ~30% of events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = (
    "the quick brown fox jumps over lazy dog spark merge upsert delta "
    "conversation agent tool result stream batch shuffle partition skew "
    "watermark lsn epoch manifest snapshot commit replay resume".split()
)


def spark_change_log(
    spark: SparkSession,
    n_events: int,
    n_convs: int,
    n_turns: int = 40,
    delete_pct: int = 8,
) -> DataFrame:
    """Deterministic transcript change log as a DataFrame (lsn 1..n_events)."""
    df = spark.range(1, n_events + 1).select(F.col("id").alias("lsn"))
    h = lambda k: F.abs(F.xxhash64(F.col("lsn"), F.lit(k)))  # noqa: E731

    n_hot = max(n_convs // 100, 1)
    conv_n = F.when(
        F.pmod(h(0), F.lit(100)) < 30, F.pmod(h(1), F.lit(n_hot))
    ).otherwise(F.pmod(h(2), F.lit(n_convs)))
    conv_id = F.concat(F.lit("conv_"), F.lpad(conv_n.cast("string"), 8, "0"))
    turn_idx = F.pmod(h(3), F.lit(n_turns)).cast("int")

    opsel = F.pmod(h(4), F.lit(100))
    op = (
        F.when(opsel < delete_pct, "D")
        .when(opsel < 50, "I")
        .otherwise("U")
    )

    words = F.array(*[F.lit(w) for w in _WORDS])
    word = lambda k: words[F.pmod(h(k), F.lit(len(_WORDS))).cast("int")]  # noqa: E731
    text = F.concat_ws(
        " ", word(5), word(6), word(7), word(8), word(9), word(10),
        F.col("lsn").cast("string"),
    )
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    role = roles[F.pmod(h(11), F.lit(4)).cast("int")]
    tool = F.when(role == "tool", F.lit("search")).otherwise(F.lit(""))
    ts = F.timestamp_micros(
        F.lit(1704067200000000) + F.col("lsn") * 1_000_000
    )

    is_d = op == "D"
    null_on_d = lambda c, t: F.when(is_d, F.lit(None).cast(t)).otherwise(c)  # noqa: E731
    return df.select(
        "lsn",
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        null_on_d(role, "string").alias("role"),
        null_on_d(text, "string").alias("text"),
        null_on_d(tool, "string").alias("tool"),
        null_on_d(ts, "timestamp").alias("ts"),
    )


def write_bench_log(
    spark: SparkSession, path: str, n_events: int, n_convs: int, n_files: int = 32
) -> None:
    """Materialize the log as lsn-range-ordered parquet files (the tailer layout)."""
    (
        spark_change_log(spark, n_events, n_convs)
        .withColumn("_seg", (F.col("lsn") * n_files / (n_events + 1)).cast("int"))
        .repartitionByRange(n_files, "_seg", "lsn")
        .drop("_seg")
        .write.mode("overwrite")
        .parquet(path)
    )
