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


def build_kafka_options(uri: str, streaming: bool = True) -> dict[str, str]:
    """Full option map for ``spark.read[Stream].format('kafka')``."""
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
    for k, v in parse_qsl(qs):
        if k in _KNOWN or k.startswith("kafka."):
            opts[k] = v
        else:
            raise ValueError(
                f"unknown kafka option {k!r} (kafka.* passes through): {uri!r}"
            )
    opts.setdefault("startingOffsets", "earliest")
    # a truncated/compacted-away offset range is the CT "log pruned past
    # watermark" case — it must fail loudly, never skip silently
    opts.setdefault("failOnDataLoss", "true")
    if not streaming:
        # batch backfill reads a bounded range
        opts.setdefault("endingOffsets", "latest")
    else:
        opts.pop("endingOffsets", None)  # streaming reader rejects it
    return opts


def kafka_stream(spark: SparkSession, uri: str, spec: IngestSpec) -> DataFrame:
    """readStream tail of a Debezium topic → the spec's change schema."""
    from relational_data_loader_spark.sources.debezium import parse_debezium

    raw = (
        spark.readStream.format("kafka")
        .options(**build_kafka_options(uri, streaming=True))
        .load()
    )
    return parse_debezium(
        raw.select(F.col("value").cast("string").alias("value")), spec
    )


def kafka_batch(spark: SparkSession, uri: str, spec: IngestSpec) -> DataFrame:
    """Bounded batch backfill of a Debezium topic (earliest..latest by
    default; pin offsets in the URI for a reproducible slice)."""
    from relational_data_loader_spark.sources.debezium import parse_debezium

    raw = (
        spark.read.format("kafka")
        .options(**build_kafka_options(uri, streaming=False))
        .load()
    )
    return parse_debezium(
        raw.select(F.col("value").cast("string").alias("value")), spec
    )
