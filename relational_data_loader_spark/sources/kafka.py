"""Kafka tail source — the standard transport for Debezium envelopes.

URI shape (S5 dispatch, like ``jdbc://``):

    kafka://broker1:9092,broker2:9092/topic.name?startingOffsets=earliest&...

- interpreted keys: ``startingOffsets`` (default earliest),
  ``endingOffsets`` (batch backfill only), ``maxOffsetsPerTrigger``
  (streaming micro-batch bound — the C2 batch_size analog in offsets),
  ``failOnDataLoss`` (default true: a pruned topic must fail the load, the
  same stance as the CT min-valid-version rule S3);
- any ``kafka.``-prefixed key passes through verbatim to the consumer
  (security protocol, SASL, etc.) — credentials belong in deployment
  config, not in specs;
- the record VALUE is the Debezium envelope (sources/debezium.py); null
  values (compaction tombstones) are dropped by the parser.

Like the JDBC source, everything up to ``.load()`` is pure option assembly,
unit-tested without the ``spark-sql-kafka`` connector jar;
``kafka_available`` gates the runtime path.
"""

from __future__ import annotations

from urllib.parse import parse_qsl

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from relational_data_loader_spark.spec import IngestSpec

# keys we interpret; kafka.* keys pass through verbatim
_KNOWN = {"startingOffsets", "endingOffsets", "maxOffsetsPerTrigger",
          "failOnDataLoss"}


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def build_kafka_options(
    uri: str, streaming: bool = True, batch_size: int = 0
) -> dict[str, str]:
    """Full option map for ``spark.read[Stream].format('kafka')``.

    ``batch_size`` (the spec's C2 knob) becomes the default
    ``maxOffsetsPerTrigger`` for streaming reads — without it the first
    micro-batch of an earliest-offsets subscription would pull the ENTIRE
    topic backlog into one epoch. A URI pin overrides; 0 disables.
    """
    _, _, rest = uri.partition("://")
    hostpart, _, tail = rest.partition("/")
    if not hostpart:
        raise ValueError(f"kafka:// URI needs bootstrap servers: {uri!r}")
    topic, _, qs = tail.partition("?")
    if not topic:
        raise ValueError(f"kafka:// URI needs a /topic path: {uri!r}")
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": hostpart,
        "subscribe": topic,
    }
    # keep_blank_values so '?failOnDataLoss' (missing '=false') is REJECTED
    # below instead of silently dropped with the default applied
    for k, v in parse_qsl(qs, keep_blank_values=True):
        if k not in _KNOWN and not k.startswith("kafka."):
            raise ValueError(
                f"unknown kafka option {k!r} (kafka.* passes through): {uri!r}"
            )
        if v == "":
            raise ValueError(f"kafka option {k!r} has no value: {uri!r}")
        opts[k] = v
    opts.setdefault("startingOffsets", "earliest")
    if streaming and batch_size:
        opts.setdefault("maxOffsetsPerTrigger", str(batch_size))
    # a truncated/compacted-away offset range is the CT "log pruned past
    # watermark" case — it must fail loudly, never skip silently
    opts.setdefault("failOnDataLoss", "true")
    if not streaming:
        # batch backfill reads a bounded range
        opts.setdefault("endingOffsets", "latest")
    else:
        opts.pop("endingOffsets", None)  # streaming reader rejects it
    return opts


def _require_connector(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 via --packages "
            "(kafka:// sources are jar-gated, like the Iceberg sink)"
        )


def kafka_stream(spark: SparkSession, uri: str, spec: IngestSpec) -> DataFrame:
    """readStream tail of a Debezium topic → the spec's change schema."""
    from relational_data_loader_spark.sources.debezium import parse_debezium

    _require_connector(spark)
    raw = (
        spark.readStream.format("kafka")
        .options(**build_kafka_options(uri, streaming=True,
                                       batch_size=spec.batch_size))
        .load()
    )
    return parse_debezium(
        raw.select(F.col("value").cast("string").alias("value")), spec
    )


def kafka_batch(spark: SparkSession, uri: str, spec: IngestSpec) -> DataFrame:
    """Bounded batch backfill of a Debezium topic (earliest..latest by
    default; pin offsets in the URI for a reproducible slice)."""
    from relational_data_loader_spark.sources.debezium import parse_debezium

    _require_connector(spark)
    raw = (
        spark.read.format("kafka")
        .options(**build_kafka_options(uri, streaming=False))
        .load()
    )
    return parse_debezium(
        raw.select(F.col("value").cast("string").alias("value")), spec
    )
